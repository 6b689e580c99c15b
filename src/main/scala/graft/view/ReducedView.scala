package graft.view

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** A view served from the materialized REDUCED index (per-key
  * aggregates, see [[View.materializeReduced]]) — the role of CouchDB's
  * reduce btree. `group=true` queries return the stored aggregates
  * directly; `group_level` rollups and the global reduce RE-AGGREGATE
  * the stored per-key values with the reduce's merge function
  * (CouchDB's rereduce), touching only the aggregates in range — never
  * the raw rows. Range options prune exactly like the raw index: bucket
  * directories via the shared bounds, row groups via the `_ck` binary
  * range.
  *
  * Builtin reduces merge as: `_count` → sum, `_sum` → sum, `_stats` →
  * (sum, sum, min, max, sum). Custom reduces supply their own merge via
  * `Reduce.Custom(agg, merge = Some(...))` — CouchDB's `rereduce=true`
  * contract; without one, `group_level`/global queries must use the raw
  * path ([[View.query]]) while `group=true` still serves stored values.
  */
final class ReducedView private[view] (
    rows: DataFrame,
    meta: IndexMeta,
    reduce: Reduce,
    locale: Boolean) {

  /** The change-feed sequence the index is current through. */
  def updateSeq: Long = meta.updateSeq

  private def ck: Column = col("_ck")
  private def enc(k: Any): Column = lit(View.encodeKey(k, locale))

  /** CouchDB's rereduce for the builtin reduces. */
  private def mergeAgg: Column = reduce match {
    case Reduce.Count => sum(col("value")).as("value")
    case Reduce.Sum => sum(col("value")).as("value")
    case Reduce.Stats =>
      struct(
        sum(col("value.sum")).as("sum"),
        sum(col("value.count")).as("count"),
        min(col("value.min")).as("min"),
        max(col("value.max")).as("max"),
        sum(col("value.sumsqr")).as("sumsqr")).as("value")
    case Reduce.ApproxCountDistinct(_) =>
      // rereduce = sketch union: HLL registers merge losslessly, so a
      // rollup estimate equals the estimate a flat pass would produce
      val u = hll_union_agg(col("value.hll"))
      struct(hll_sketch_estimate(u).as("count"), u.as("hll")).as("value")
    case Reduce.Custom(_, Some(m)) => m(col("value")).as("value")
    case Reduce.Custom(_, None) =>
      throw new IllegalArgumentException(
        "custom reduce without a merge (rereduce) function: use the raw " +
          "index for group_level/global queries (group=true serves " +
          "stored values), or supply Reduce.Custom(agg, merge = Some(...))")
  }

  /** Query the reduced index. Supported options: `group`, `groupLevel`,
    * `key`/`keys`, `startKey`/`endKey`/`inclusiveEnd`, `descending`,
    * `limit`, `skip`. Returns `(key, value)` rows in collation order. */
  def query(opts: QueryOpts = QueryOpts()): DataFrame =
    queryKeepCk(opts, None).drop("_ck")

  private def queryKeepCk(opts: QueryOpts,
                          after: Option[Array[Byte]]): DataFrame = {
    require(opts.skip <= Int.MaxValue && opts.limit.forall(_ <= Int.MaxValue),
      "skip/limit beyond Int.MaxValue: page with startKey resume bounds")
    var r = rows
    // Keyset cursor ([[queryPage]]): the token holds the GROUP key's
    // collation — for group_level rollups that is a truncated array
    // prefix, which collates strictly BELOW every stored full key of
    // its own group (TArr prefix terminator < any element tag). The
    // stored-row filters here are therefore only PRUNING: ascending
    // `_ck > cursor` keeps every row of every wanted group (their full
    // keys extend a prefix > cursor) but also the boundary group's own
    // rows; the exact cut happens post-aggregation on the recomputed
    // group `_ck` below. Descending `_ck < cursor` is already exact
    // (the boundary group's full keys collate above its prefix).
    after.foreach { b =>
      r = if (opts.descending) r.filter(ck < lit(b))
          else r.filter(ck > lit(b))
      if (meta.bounds.nonEmpty) {
        val cb = IndexStore.bucketOf(meta, b)
        r = if (opts.descending) r.filter(col("_kb") <= cb)
            else r.filter(col("_kb") >= cb)
      }
    }
    opts.key.foreach(k => r = r.filter(ck === enc(k)))
    opts.keys.foreach(ks =>
      r = r.filter(ck.isin(ks.map(View.encodeKey(_, locale)).distinct: _*)))
    if (!opts.descending) {
      opts.startKey.foreach(k => r = r.filter(ck >= enc(k)))
      opts.endKey.foreach(k => r = r.filter(
        if (opts.inclusiveEnd) ck <= enc(k) else ck < enc(k)))
    } else {
      opts.startKey.foreach(k => r = r.filter(ck <= enc(k)))
      opts.endKey.foreach(k => r = r.filter(
        if (opts.inclusiveEnd) ck >= enc(k) else ck > enc(k)))
    }
    // bucket-directory pruning via the bounds shared with the raw index
    if (meta.bounds.nonEmpty) {
      val kb = col("_kb")
      def bk(k: Any): Int = IndexStore.bucketOf(meta, View.encodeKey(k, locale))
      opts.key.foreach(k => r = r.filter(kb === bk(k)))
      opts.keys.foreach(ks => r = r.filter(kb.isin(ks.map(bk).distinct: _*)))
      val lowKey = if (opts.descending) opts.endKey else opts.startKey
      val highKey = if (opts.descending) opts.startKey else opts.endKey
      lowKey.foreach(k => r = r.filter(kb >= bk(k)))
      highKey.foreach(k => r = r.filter(kb <= bk(k)))
    }

    var out: DataFrame = opts.groupLevel match {
      // keys= implies group=true (exact per-key rows), as in [[View.query]]
      case _ if opts.keys.isDefined =>
        r.select(col("key"), col("value"), ck)
      case Some(0) =>
        r.groupBy().agg(mergeAgg)
          .select(lit(null).as("key"), col("value"),
            lit(Array.emptyByteArray).as("_ck"))
      case Some(l) if r.schema("key").dataType.isInstanceOf[ArrayType] =>
        r.groupBy(slice(col("key"), 1, l).as("key")).agg(mergeAgg)
          .withColumn("_ck",
            if (locale) graft.gfunctions.collation_key_locale(col("key"))
            else graft.gfunctions.collation_key(col("key")))
      case _ if opts.group || opts.groupLevel.isDefined =>
        r.select(col("key"), col("value"), ck)
      case _ =>
        r.groupBy().agg(mergeAgg)
          .select(lit(null).as("key"), col("value"),
            lit(Array.emptyByteArray).as("_ck"))
    }
    // Exact cursor cut on the GROUP key (see the pruning note above):
    // for group_level rollups the aggregation recomputes the truncated
    // `_ck`, and only here can "strictly past the last served group" be
    // decided — without this the boundary group would be re-aggregated
    // and re-served on every page (never advancing at pageSize=1).
    after.foreach { b =>
      out = if (opts.descending) out.filter(col("_ck") < lit(b))
            else out.filter(col("_ck") > lit(b))
    }
    out = opts.keys match {
      case Some(ks) =>
        // Multi-key fetch: one reduced row per REQUESTED key in request
        // order, repeats honored (the reference's group=true + keys
        // semantics) — join the aggregates back against the request list.
        val spark = out.sparkSession
        import spark.implicits._
        val req = ks.map(View.encodeKey(_, locale)).zipWithIndex
          .toDF("_ck", "_req_idx")
        out.join(broadcast(req), Seq("_ck"))
          .orderBy(col("_req_idx").asc).drop("_req_idx")
      case None =>
        if (opts.descending) out.orderBy(col("_ck").desc)
        else out.orderBy(col("_ck").asc)
    }
    if (opts.skip > 0) out = out.offset(opts.skip.toInt)
    opts.limit.foreach(l => out = out.limit(l.toInt))
    out
  }

  /** Keyset-paginated reduced query — group rows page by a group-key
    * cursor exactly as [[View.queryPage]]'s reduced mode, but served
    * from the STORED aggregates with the cursor pruning bucket
    * directories (the scale path: page N of a billion-group view reads
    * from the cursor's bucket onward, never re-aggregates, never
    * scans the skipped prefix). `keys=` fetches are request-ordered
    * and cannot cursor. */
  def queryPage(opts: QueryOpts = QueryOpts(group = true),
                pageSize: Int = 1000,
                resume: Option[String] = None): ViewQueryResult = {
    require(pageSize > 0, "pageSize must be positive")
    require(opts.keys.isEmpty,
      "queryPage cannot page a keys= fetch (request order, not " +
        "collation order) — page the keys list caller-side")
    val cursor = resume.map(ResumeToken.decode)
    val o = opts.copy(skip = 0, limit = Some(pageSize.toLong))
    val page = queryKeepCk(o, cursor.map(_._2))
    val got = page.collect()
    val next =
      if (got.length < pageSize) None
      else Some(ResumeToken.encode(meta.updateSeq,
        got.last.getAs[Array[Byte]]("_ck"), 0L))
    val spark = page.sparkSession
    val ckIdx = page.schema.fieldIndex("_ck")
    val outSchema = org.apache.spark.sql.types.StructType(
      page.schema.fields.zipWithIndex.filter(_._2 != ckIdx).map(_._1))
    val stripped = got.map { r =>
      org.apache.spark.sql.Row.fromSeq(
        r.toSeq.zipWithIndex.filter(_._2 != ckIdx).map(_._1))
    }
    // total_rows from the meta stamp (written with every reduced-dir
    // write) — a count job per page was the round-6 finding; the scan
    // fallback only covers pre-stamp artifacts
    val totalRows =
      if (meta.reducedGroups >= 0) meta.reducedGroups else rows.count()
    ViewQueryResult(
      spark.createDataFrame(
        java.util.Arrays.asList(stripped: _*), outSchema),
      totalRows, 0L, Some(meta.updateSeq), next)
  }
}
