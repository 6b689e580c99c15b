package graft.view

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Index metadata persisted alongside the data: the change-feed sequence
  * the index is current through (CouchDB's `update_seq`), the bucket
  * count, and the per-bucket minimum collation key (the range bounds new
  * keys are routed by). `bounds` holds (bucketId, min `_ck`) for every
  * bucket that was non-empty at creation, in key order. */
final case class IndexMeta(updateSeq: Long, buckets: Int,
                           bounds: Seq[(Int, Array[Byte])],
                           /** Stored group count of the reduced index
                             * (-1 = none/unknown): serves the paging
                             * envelope's total_rows without a count job
                             * per page. Stamped by every reduced-dir
                             * write ([[IndexStore.writeReduced]] /
                             * [[IndexStore.refreshReduced]]). */
                           reducedGroups: Long = -1L,
                           /** CouchDB's `purge_seq`: on a document
                             * store, how many purge batches it has
                             * applied; on a secondary index, the
                             * store purge_seq the index has caught up
                             * to ([[IndexStore.purgeIndex]]). 0 =
                             * never purged / pre-purge artifact. */
                           purgeSeq: Long = 0L,
                           /** The update_seq stamped by the artifact's
                             * FIRST meta write — the seq of its
                             * creation event on a `_db_updates` feed
                             * ([[graft.operators.Replication.dbUpdates]]).
                             * Stamped automatically by [[writeMeta]]
                             * when no prior meta exists and preserved
                             * by every later write; -1 on artifacts
                             * written before the field existed. */
                           createdSeq: Long = -1L,
                           /** Winner-rule document counts CACHED at
                             * `countsSeq` (CouchDB keeps doc_count in
                             * the db header — `GET /db` is O(1), not
                             * a scan). Valid ONLY when `countsSeq ==
                             * updateSeq`: a writer that does not
                             * maintain the counts leaves them stale
                             * and readers fall back to the scan (and
                             * self-heal the stamp). -1 = never
                             * stamped. */
                           docCount: Long = -1L,
                           delCount: Long = -1L,
                           countsSeq: Long = -1L)

/** On-disk layout and maintenance of a persistent view index — the
  * reference's design-doc view storage (pouchdb-abstract-mapreduce's
  * by-key + by-id btrees), re-expressed as range-bucketed parquet:
  *
  * {{{
  * path/
  *   _graft_meta        update_seq + bucket range bounds (text)
  *   data/_kb=<b>/      view rows (_id, key, value, _ck), range-bucketed
  *                      by _ck, sorted by _ck within each file
  *   ids/_ib=<b>/       by-id sidecar (_id, _kb): which key buckets each
  *                      doc emitted into (the role of CouchDB's by-id
  *                      btree: find a changed doc's OLD rows without
  *                      scanning the index)
  * }}}
  *
  * The layout is what makes maintenance O(changed buckets), not
  * O(index): an incremental update reads the by-id sidecar (pruned to
  * the changed ids' hash buckets) to find which key buckets hold the
  * changed docs' old rows, then rewrites ONLY those `_kb` directories.
  * Untouched bucket directories are never read or written — at 100 TB a
  * small change-feed batch touches a handful of buckets, not the index.
  * Queries prune the same way: `startkey`/`endkey` become a `_kb` range
  * (directory-level partition pruning) plus a binary `_ck` range pushed
  * to parquet (row-group min/max pruning within the bucket).
  *
  * A failed update is safe to retry: the merge is idempotent (affected
  * buckets are rebuilt from surviving rows + the batch's new rows), and
  * each bucket directory is swapped by rename with failures thrown, so
  * a crash leaves buckets either old or new, never truncated.
  */
object IndexStore {

  private[graft] def fsFor(spark: SparkSession, path: String): FileSystem =
    // resolve the filesystem FROM the path: an index on s3a/hdfs must
    // not hit the default filesystem namespace
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDir(path: String) = s"$path/data"
  private def idsDir(path: String) = s"$path/ids"
  private[view] def reducedDir(path: String) = s"$path/reduced"

  /** True if a materialized reduced index (per-key aggregates) exists
    * alongside the raw index. */
  def hasReduced(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new Path(reducedDir(path)))

  /** Unsigned-lexicographic byte compare — the collation order. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Driver-side bucket routing for a literal key: the last bucket whose
    * minimum is at-or-below the key (keys below every bound route to the
    * first bucket). Used to turn startkey/endkey into `_kb` partition
    * filters. */
  def bucketOf(meta: IndexMeta, key: Array[Byte]): Int =
    if (meta.bounds.isEmpty) 0
    else meta.bounds.takeWhile(b => cmp(b._2, key) <= 0)
      .lastOption.map(_._1).getOrElse(meta.bounds.head._1)

  /** Column-side bucket routing for new index rows: the native
    * [[RangeBucket]] binary-search expression over the stored bounds —
    * O(log buckets) per row with constant-size generated code (a
    * when-chain would be O(buckets) per row AND per plan, breaking down
    * at the bucket counts a 100 TB index needs). Same routing as the
    * driver-side [[bucketOf]]. */
  def bucketCol(ck: Column, meta: IndexMeta): Column =
    if (meta.bounds.isEmpty) lit(0)
    else org.apache.spark.sql.graft.Bridge.column(RangeBucket(
      org.apache.spark.sql.graft.Bridge.expression(ck),
      meta.bounds.map(_._1).toArray,
      meta.bounds.map(_._2).toArray))

  /** Hash bucket of a doc id for the by-id sidecar layout. */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(xxhash64(id.cast("string")), lit(buckets.toLong)).cast("int")

  /** Read a hive-partitioned store directory pruned at the
    * partition-directory-NAME level to the given integer bucket ids:
    * a bare `read.parquet(dir)` enumerates EVERY partition's leaf
    * files before partition-pruning, so a touched-bucket read over a
    * store with many buckets pays the whole store's listing (driver
    * time ∝ store size — the EventStore.readRange finding; the
    * deployment discipline sizes buckets ∝ corpus, so the listing
    * grows with data). One status call lists directory names; the
    * parquet reader then enumerates leaf files only under the hit
    * buckets. Callers KEEP their own partition-column filter — the
    * name cut is a listing optimization, never the correctness cut.
    * Falls back to one bucket (schema only) or the full read when
    * nothing matches. */
  private[graft] def readBuckets(spark: SparkSession, dir: String,
                                 part: String, ids: Seq[Int]): DataFrame = {
    val want = ids.map(_.toLong).toSet
    readWhere(spark, dir, part, want)
  }

  /** The predicate form of [[readBuckets]] — one listing-prune
    * implementation for every integral partition scheme: exact bucket
    * sets (`readBuckets`), checkpoint tails (ChangesFeed's
    * `_kb >= minKb`), day windows (EventStore's `_day` range). */
  private[graft] def readWhere(spark: SparkSession, dir: String,
                               part: String,
                               keep: Long => Boolean): DataFrame = {
    val fs = fsFor(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) return spark.read.parquet(dir) // loud, as before
    val all = fs.listStatus(p).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(part + "="))
    val hit = all.filter(s => scala.util.Try(
      s.getPath.getName.substring(part.length + 1).toLong)
      .toOption.exists(keep))
    // nothing in range: one partition dir supplies the schema, the
    // caller's partition-column filter drops its rows
    val toRead = if (hit.nonEmpty) hit else all.take(1)
    if (toRead.isEmpty) spark.read.parquet(dir)
    else spark.read.option("basePath", dir)
      .parquet(toRead.map(_.getPath.toString).toIndexedSeq: _*)
  }

  def exists(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new Path(path, "_graft_meta"))

  def writeMeta(spark: SparkSession, path: String, meta0: IndexMeta): Unit = {
    // creation-seq bookkeeping is automatic: the first write of a meta
    // file stamps createdSeq = its updateSeq (the creation event's seq);
    // later writes that pass the -1 default inherit the stored value so
    // no caller has to thread it (a full rebuild deletes the meta first
    // and so re-stamps — a rebuilt artifact IS a new creation event)
    val meta =
      if (meta0.createdSeq >= 0) meta0
      else if (exists(spark, path))
        meta0.copy(createdSeq = readMeta(spark, path).createdSeq)
      else meta0.copy(createdSeq = meta0.updateSeq)
    val enc = java.util.Base64.getEncoder
    val sb = new StringBuilder("v1\n")
    sb.append(s"updateSeq=${meta.updateSeq}\n")
    sb.append(s"buckets=${meta.buckets}\n")
    meta.bounds.foreach { case (b, lo) =>
      sb.append(s"bound=$b:${enc.encodeToString(lo)}\n")
    }
    if (meta.reducedGroups >= 0)
      sb.append(s"rgroups=${meta.reducedGroups}\n")
    if (meta.purgeSeq > 0)
      sb.append(s"purgeSeq=${meta.purgeSeq}\n")
    if (meta.createdSeq >= 0)
      sb.append(s"createdSeq=${meta.createdSeq}\n")
    if (meta.countsSeq >= 0)
      sb.append(s"counts=${meta.docCount}:${meta.delCount}:" +
        s"${meta.countsSeq}\n")
    val out = fsFor(spark, path).create(new Path(path, "_graft_meta"), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  def readMeta(spark: SparkSession, path: String): IndexMeta = {
    val in = fsFor(spark, path).open(new Path(path, "_graft_meta"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val dec = java.util.Base64.getDecoder
    var seq = 0L; var buckets = 0; var rgroups = -1L; var pq = 0L
    var created = -1L; var doc = -1L; var del = -1L; var cseq = -1L
    val bounds = Seq.newBuilder[(Int, Array[Byte])]
    text.linesIterator.foreach {
      case l if l.startsWith("updateSeq=") => seq = l.drop(10).toLong
      case l if l.startsWith("buckets=") => buckets = l.drop(8).toInt
      case l if l.startsWith("bound=") =>
        val Array(b, b64) = l.drop(6).split(":", 2)
        bounds += ((b.toInt, dec.decode(b64)))
      case l if l.startsWith("rgroups=") => rgroups = l.drop(8).toLong
      case l if l.startsWith("purgeSeq=") => pq = l.drop(9).toLong
      case l if l.startsWith("createdSeq=") => created = l.drop(11).toLong
      case l if l.startsWith("counts=") =>
        val Array(dc, xc, cs) = l.drop(7).split(":", 3)
        doc = dc.toLong; del = xc.toLong; cseq = cs.toLong
      case _ => ()
    }
    IndexMeta(seq, buckets, bounds.result(), rgroups, pq, created,
      doc, del, cseq)
  }

  /** Full (re)build: range-bucket the view rows by collation key, write
    * each bucket as its own partition directory sorted by `_ck`, derive
    * the bucket bounds and the by-id sidecar, stamp the metadata. */
  def create(spark: SparkSession, path: String, rows: DataFrame,
             buckets: Int, seq: Long): Unit = {
    // a zero-row build would write no bucket files and leave the index
    // unreadable — fail with intent instead of an obscure schema error
    // (the streaming maintainer skips empty batches for this reason)
    require(!rows.isEmpty,
      "cannot build an index from an empty view: materialize after the " +
        "first documents exist (the streaming maintainer defers creation " +
        "past empty batches)")
    val fs = fsFor(spark, path)
    fs.delete(new Path(path), true)
    rows
      .repartitionByRange(buckets, col("_ck"))
      .withColumn("_kb", spark_partition_id())
      // the _kb prefix satisfies the writer's partition-column ordering
      // requirement, so the writer does not re-sort and break _ck order
      .sortWithinPartitions(col("_kb"), col("_ck"))
      .write.mode("overwrite").partitionBy("_kb").parquet(dataDir(path))
    val data = spark.read.parquet(dataDir(path))
    val bounds = data.groupBy(col("_kb")).agg(min(col("_ck")).as("lo"))
      .orderBy(col("_kb")).collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]]("lo"))).toSeq
    data.select(col("_id"), col("_kb")).distinct()
      .withColumn("_ib", idBucket(col("_id"), buckets))
      .repartition(buckets, col("_ib"))
      .sortWithinPartitions(col("_ib"), col("_id"))
      .write.mode("overwrite").partitionBy("_ib").parquet(idsDir(path))
    writeMeta(spark, path, IndexMeta(seq, buckets, bounds))
  }

  /** Incremental merge of one change batch. `newRows` are the mapped
    * view rows of the changed docs (with `_kb` routed via [[bucketCol]]);
    * `changedIds` holds every changed OR deleted doc id. Only the key
    * buckets that contain old rows of changed ids (found via the by-id
    * sidecar) or receive new rows are read and rewritten. */
  def merge(spark: SparkSession, path: String, meta: IndexMeta,
            newRows0: DataFrame, changedIds: DataFrame,
            newSeq: Long,
            dataSortCols: Seq[Column] = Seq(col("_kb"), col("_ck"))): Seq[Int] = {
    val fs = fsFor(spark, path)
    // the batch rows and ids feed several jobs (bucket discovery, data
    // swap, sidecar swap) — pin them so the upstream map phase runs
    // once per batch, not once per consumer
    val cids = changedIds.toDF("_id").distinct().persist()
    val newRows = newRows0.persist()
    try {
      val withIb = cids.withColumn("_ib", idBucket(col("_id"), meta.buckets))
      val ibs = withIb.select(col("_ib")).distinct()
        .collect().map(_.getInt(0)).toSeq
      // by-id lookup, pruned to the changed ids' hash buckets — O(batch),
      // never a scan of the whole sidecar, let alone the index
      val oldKbs = spark.read.parquet(idsDir(path))
        .filter(col("_ib").isin(ibs: _*))
        .join(cids, Seq("_id"), "left_semi")
        .select(col("_kb")).distinct().collect().map(_.getInt(0)).toSeq
      val newKbs = newRows.select(col("_kb")).distinct()
        .collect().map(_.getInt(0)).toSeq
      val affected = (oldKbs ++ newKbs).distinct.sorted
      if (affected.nonEmpty) {
        val merged = readBuckets(spark, dataDir(path), "_kb", affected)
          .filter(col("_kb").isin(affected: _*))
          .join(cids, Seq("_id"), "left_anti")
          .unionByName(newRows)
        writeSwap(spark, fs, merged, dataDir(path), "_kb", affected,
          dataSortCols)
        val mergedIds = spark.read.parquet(idsDir(path))
          .filter(col("_ib").isin(ibs: _*))
          .join(cids, Seq("_id"), "left_anti")
          .unionByName(
            newRows.select(col("_id"), col("_kb")).distinct()
              .withColumn("_ib", idBucket(col("_id"), meta.buckets)))
        writeSwap(spark, fs, mergedIds, idsDir(path), "_ib", ibs,
          Seq(col("_ib"), col("_id")))
      }
      writeMeta(spark, path, meta.copy(updateSeq = newSeq))
      affected
    } finally {
      cids.unpersist()
      newRows.unpersist()
    }
  }

  /** Purge-propagation primitive for every IndexStore-layout secondary
    * index (materialized views, Mango JSON indexes, IVF-family ANN
    * stores): retire the given doc ids' rows WITHOUT a rebuild —
    * CouchDB's view-index purge catch-up. A delete-only [[merge]]: the
    * by-id sidecar (pruned to the purged ids' hash buckets) locates
    * the old rows, only those key buckets are read, anti-joined, and
    * rename-swapped; untouched bucket directories stay byte-identical.
    * `update_seq` is PRESERVED (a purge is not a change — the index
    * has seen no new document versions); `newPurgeSeq` stamps the
    * store purge_seq the index is now current through, so
    * [[graft.operators.Replication.pendingPurges]] catch-ups are
    * idempotent and resumable. A still-alive doc whose winner changed
    * under a branch purge must be RE-UPSERTED by the owning index's
    * normal maintenance path after this retire (the View catch-up
    * does both in one merge). Cost: O(purged ids' buckets) — the
    * purge-request size, never the index. */
  def purgeIndex(spark: SparkSession, path: String, ids: Seq[Any],
                 rf: Option[Reduce] = None, newPurgeSeq: Long = -1L,
                 dataSortCols: Seq[Column] =
                   Seq(col("_kb"), col("_ck"))): Seq[Int] = {
    val meta = readMeta(spark, path)
    val affected =
      if (ids.isEmpty) Nil
      else {
        val data = spark.read.parquet(dataDir(path))
        val got = merge(spark, path, meta, data.limit(0).select(
            data.columns.map(col).toIndexedSeq: _*),
          idsDf(spark, data.select(col("_id")), ids), meta.updateSeq,
          dataSortCols)
        rf.foreach(r => refreshReduced(spark, path, r, got))
        got
      }
    if (newPurgeSeq >= 0)
      writeMeta(spark, path,
        readMeta(spark, path).copy(purgeSeq = newPurgeSeq))
    affected
  }

  /** Rebuild the `affected` partition directories of `destDir` from
    * `df`: write to a temp dir, then swap each affected directory by
    * rename. An affected bucket with no surviving rows is deleted (a
    * dynamic-partition overwrite would silently leave its stale
    * directory behind). Rename/delete failures throw — a failed swap
    * must never pass silently. */
  private[graft] def writeSwap(spark: SparkSession, fs: FileSystem,
                              df: DataFrame,
                              destDir: String, pcol: String,
                              affected: Seq[Int],
                              sortCols: Seq[Column]): Unit = {
    val tmp = destDir + "._tmp"
    fs.delete(new Path(tmp), true)
    df.repartition(math.max(affected.size, 1), col(pcol))
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").partitionBy(pcol).parquet(tmp)
    affected.foreach { b =>
      val dst = new Path(s"$destDir/$pcol=$b")
      val src = new Path(s"$tmp/$pcol=$b")
      if (fs.exists(dst) && !fs.delete(dst, true))
        throw new IOException(s"index update: could not drop stale bucket $dst")
      if (fs.exists(src) && !fs.rename(src, dst))
        throw new IOException(
          s"index update: bucket swap failed ($src -> $dst); rerun the update")
    }
    fs.delete(new Path(tmp), true)
  }

  /** (_kb, key, value, _ck) per-key aggregate rows of raw index rows —
    * the content of the materialized reduced index. */
  private[graft] def reducedRowsOf(data: DataFrame, rf: Reduce): DataFrame =
    data.groupBy(col("_kb"), col("key"))
      .agg(Reduce.aggFor(rf), min(col("_ck")).as("_ck"))

  /** Re-aggregate the reduced index for the `affected` raw buckets (a
    * key's rows never span buckets, so bucket-local re-aggregation is
    * complete). No-op when no reduced index exists. */
  private[graft] def refreshReduced(spark: SparkSession, path: String,
                                    rf: Reduce, affected: Seq[Int]): Unit =
    if (affected.nonEmpty && hasReduced(spark, path)) {
      val data = readBuckets(spark, dataDir(path), "_kb", affected)
        .filter(col("_kb").isin(affected: _*))
      writeSwap(spark, fsFor(spark, path), reducedRowsOf(data, rf),
        reducedDir(path), "_kb", affected, Seq(col("_kb"), col("_ck")))
      stampReducedGroups(spark, path)
    }

  /** Re-stamp `reducedGroups` after a reduced-dir write. The count job
    * is parquet-footer-speed (empty read schema) and runs ONCE per
    * write, so every later paging envelope serves total_rows straight
    * from the meta — no count job per page. */
  private def stampReducedGroups(spark: SparkSession, path: String): Unit = {
    val n = spark.read.parquet(reducedDir(path)).count()
    writeMeta(spark, path, readMeta(spark, path).copy(reducedGroups = n))
  }

  /** Per-bucket row counts — the skew diagnostic that tells an operator
    * (or a maintenance policy) when to [[compact]]. Scans only the
    * partition column, so the cost is footer metadata per file, not the
    * data. */
  def bucketStats(spark: SparkSession, path: String): Map[Int, Long] =
    spark.read.parquet(dataDir(path))
      .groupBy(col("_kb")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Derive (or re-derive) the materialized reduced index from the
    * current raw data — used by [[graft.view.View.materializeReduced]]
    * and after [[compact]] re-sampled the bucket layout. */
  private[graft] def writeReduced(spark: SparkSession, path: String,
                                  rf: Reduce): Unit = {
    reducedRowsOf(spark.read.parquet(dataDir(path)), rf)
      .repartition(col("_kb"))
      .sortWithinPartitions(col("_kb"), col("_ck"))
      .write.mode("overwrite").partitionBy("_kb")
      .parquet(reducedDir(path))
    stampReducedGroups(spark, path)
  }

  /** Automatic compaction policy for long-lived maintained indexes:
    * incremental merges route new keys into the CREATION-TIME range
    * bounds, so a drifting change feed slowly overloads one bucket.
    * When the largest bucket exceeds `maxSkew` × the median bucket row
    * count, rebuild with fresh sampled bounds ([[compact]]) and
    * re-derive the reduced index if one existed (compaction drops it —
    * its layout is bucket-aligned). Returns true when compaction ran.
    * Run from the maintainers per batch: the stats pass is footer
    * metadata, the rebuild amortizes like any table-maintenance job. */
  def maybeCompact(spark: SparkSession, path: String,
                   rf: Option[Reduce] = None, maxSkew: Double = 8.0,
                   numBuckets: Int = 0): Boolean = {
    val counts = bucketStats(spark, path).values.toSeq.sorted
    if (counts.size < 2) return false
    val median = math.max(counts(counts.size / 2), 1L)
    if (counts.last.toDouble / median <= maxSkew) false
    else {
      val hadReduced = hasReduced(spark, path)
      compact(spark, path, numBuckets)
      if (hadReduced) rf.foreach(writeReduced(spark, path, _))
      true
    }
  }

  /** Rebalance a long-lived index: full rebuild with FRESH range bounds
    * sampled from the current data (optionally a new bucket count for a
    * grown index), preserving the update_seq. Incremental merges route
    * new keys into the fixed creation-time bounds, so a skewed change
    * feed eventually overloads one bucket — compaction is the periodic
    * amortized fix (run it like any table-maintenance job). The rebuilt
    * index is written beside the live one and swapped in two renames;
    * a crash between them leaves the old index at `path + "._old"`. */
  def compact(spark: SparkSession, path: String, numBuckets: Int = 0): Unit = {
    val meta = readMeta(spark, path)
    val n = if (numBuckets > 0) numBuckets else meta.buckets
    val rows = spark.read.parquet(dataDir(path)).drop("_kb")
    val tmp = path + "._compact"
    create(spark, tmp, rows, n, meta.updateSeq)
    val fs = fsFor(spark, path)
    val old = new Path(path + "._old")
    fs.delete(old, true)
    if (!fs.rename(new Path(path), old))
      throw new IOException(s"compact: could not move live index aside ($path)")
    if (!fs.rename(new Path(tmp), new Path(path)))
      throw new IOException(
        s"compact: swap failed — old index preserved at $old, new at $tmp")
    fs.delete(old, true)
  }

  /** Build a one-column `_id` DataFrame for literal deleted ids, typed
    * like `idsLike`'s `_id` column. */
  /** `changed` minus the rows whose id is in `deletedIds` — a batch
    * carrying BOTH an update and a tombstone for one id must let the
    * tombstone WIN (in feed order the delete is the later event);
    * without this cut the updated row re-enters the store right after
    * the merge removed it (resurrection). Every incremental upsert
    * routes its changed set through here before deriving new store
    * rows. */
  private[graft] def minusDeleted(spark: SparkSession, changed: DataFrame,
                                  idCol: String,
                                  deletedIds: Seq[Any]): DataFrame =
    if (deletedIds.isEmpty) changed
    else changed.join(
      idsDf(spark, changed.select(col(idCol).as("_id")), deletedIds)
        .toDF(idCol),
      Seq(idCol), "left_anti")

  def idsDf(spark: SparkSession, idsLike: DataFrame,
            ids: Seq[Any]): DataFrame = {
    val schema = idsLike.select(col("_id")).schema
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(Row(_)), 1), schema)
  }
}
