package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ChangesFeed

class ChangesFeedSpec extends SparkSpecBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  /** 300 docs, three write generations: rev1 for all (seq=id*3), rev2
    * for evens (id*3+1), a tail append of rev3 for %5 (seq=900+id). */
  private def makeStore(): (String, DataFrame) = {
    import spark.implicits._
    val d = (0L until 300L).toDF("id")
    def rev(n: Int) = concat(lit(s"$n-"),
      md5(concat(col("id").cast("string"), lit(s":$n"))))
    def batch(seq: org.apache.spark.sql.Column, n: Int,
              del: org.apache.spark.sql.Column)(b: DataFrame) =
      b.select(seq.cast("long").as("seq"), col("id"), rev(n).as("rev"),
        del.as("deleted"))
    val base = batch(col("id") * 3, 1, lit(false))(d)
      .unionByName(batch(col("id") * 3 + 1, 2, lit(false))(
        d.filter(col("id") % 2 === 0)))
    val tail = batch(lit(900L) + col("id"), 3, col("id") % 10 === 0)(
      d.filter(col("id") % 5 === 0))
    val dir = java.nio.file.Files.createTempDirectory("chg").toString
    val store = s"$dir/feed"
    ChangesFeed.write(base, store, width = 8)
    ChangesFeed.append(tail, store)
    (store, base.unionByName(tail))
  }

  private def expectSince(log: DataFrame, since: Long): Seq[(Long, Long)] =
    log.filter(col("seq") > since)
      .groupBy(col("id")).agg(max(col("seq")).as("seq"))
      .orderBy(col("seq"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq

  test("since == latest-change-per-doc over the post-checkpoint log") {
    val (store, log) = makeStore()
    for (since <- Seq(-1L, 0L, 450L, 899L, 1100L, 5000L)) {
      val got = ChangesFeed.since(spark, store, since)
        .select("seq", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expectSince(log, since), s"since=$since")
    }
    // rev/deleted travel with the winning change
    val one = ChangesFeed.since(spark, store, 1050L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(one.forall(_._3.startsWith("3-")))
    assert(one.exists(_._4) && one.exists(!_._4))
  }

  test("the read prunes already-replicated seq buckets") {
    val (store, _) = makeStore()
    val got = ChangesFeed.since(spark, store, 700L)
    got.collect()
    val scans = collect(got.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.toString.contains("_kg")),
      "expected a _kg partition filter")
    // width=8, SeqGroup=8 -> 64-seq dirs: dirs 0..9 hold the already-
    // replicated prefix; the checkpoint at 700 must scan exactly the
    // files of dirs >= 10
    def bucketFiles(pred: Long => Boolean): Int =
      new java.io.File(store).listFiles()
        .filter(d => d.getName.startsWith("_kg=") &&
          pred(d.getName.stripPrefix("_kg=").toLong))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val scanned = scans.head.metrics("numFiles").value
    assert(scanned == bucketFiles(_ >= 10L) && bucketFiles(_ < 10L) > 0,
      s"scanned $scanned files, want ${bucketFiles(_ >= 10L)} " +
        s"(+${bucketFiles(_ < 10L)} pruned)")
  }

  test("replicationDelta: pushes only missing revs, tombstones travel, converges") {
    import spark.implicits._
    val (store, log) = makeStore()
    // target already holds rev1 of every doc and rev2 of %4 docs
    val target = (0L until 300L).toDF("id")
      .select(col("id"), concat(lit("1-"),
        md5(concat(col("id").cast("string"), lit(":1")))).as("rev"))
      .unionByName((0L until 300L).filter(_ % 4 == 0).toDF("id")
        .select(col("id"), concat(lit("2-"),
          md5(concat(col("id").cast("string"), lit(":2")))).as("rev")))
    val push = ChangesFeed.replicationDelta(spark, store, -1L, target)
    val rows = push.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    // every %5 doc's latest is rev3 (never on target) — all pushed,
    // including the %10 tombstones
    assert(rows.count(_._3.startsWith("3-")) == 60)
    assert(rows.count(_._4) == 30, "tombstones must travel")
    // even non-%5 docs: latest rev2, on target only when %4
    assert(rows.count(_._3.startsWith("2-")) == 300 / 2 - 300 / 10 -
      (300 / 4 - 15))
    // nothing already present is pushed
    val present = target.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows.forall(e => !present.contains((e._2, e._3))))
    // convergence: push the set, next delta from the same checkpoint is empty
    val target2 = target.unionByName(
      push.select(col("id"), col("rev")))
    assert(ChangesFeed.replicationDelta(spark, store, -1L, target2)
      .count() == 0)
  }

  test("compact rewrites only fragmented buckets; reads unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chgc").toString
    val store = s"$dir/feed"
    def gen(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, i % 20, s"r$i", false)).toDF("seq", "id", "rev", "deleted")
    ChangesFeed.write(gen(0, 64), store, width = 8)
    // six appends all land in bucket 1 → fragment it; bucket 0 untouched
    (0 until 6).foreach(j => ChangesFeed.append(gen(64 + j * 4, 68 + j * 4),
      store))
    def files(kb: Long): Seq[String] = {
      val d = new java.io.File(s"$store/_kg=$kb")
      if (!d.exists()) Nil
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
        .sorted.toSeq
    }
    val b0Before = files(0)
    assert(files(1).size > 4, "bucket 1 should be fragmented")
    val before = ChangesFeed.since(spark, store, 30L).collect().toSeq
    val compacted = ChangesFeed.compact(spark, store, maxFilesPerBucket = 4)
    assert(compacted == Seq(1L), s"only bucket 1 compacts: $compacted")
    assert(files(1).size == 1 && files(0) == b0Before,
      "bucket 1 one file; bucket 0 byte-untouched")
    assert(ChangesFeed.since(spark, store, 30L).collect().toSeq == before)
    assert(ChangesFeed.lastSeq(spark, store) == 87L)
  }

  test("lastSeq reads the tail bucket; limit pages are resumable") {
    val (store, log) = makeStore()
    assert(ChangesFeed.lastSeq(spark, store) ==
      log.agg(max("seq")).head().getLong(0))
    // page through from scratch in 3 pages of 40 and re-derive the whole
    var ckpt = -1L
    var pages = Seq.empty[(Long, Long)]
    var done = false
    while (!done) {
      val page = ChangesFeed.since(spark, store, ckpt, limit = Some(40))
        .select("seq", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      if (page.isEmpty) done = true
      else { pages ++= page; ckpt = page.map(_._1).max }
    }
    // paged union dedups to the same latest-change relation
    val dedup = pages.groupBy(_._2).map { case (id, ps) =>
      (ps.map(_._1).max, id)
    }.toSeq.sortBy(_._1)
    assert(dedup == expectSince(log, -1L))
  }

  test("sinceFiltered: selector semi-join; known tombstones pass, unknown ids drop") {
    import spark.implicits._
    val (store, log) = makeStore()
    // docs corpus: ids 0..249 known with a category column; the log
    // also carries ids 250..299, UNKNOWN to the corpus
    val docs = (0L until 250L).map(i => (i, if (i % 3 == 0) "hot" else "cold"))
      .toDF("id", "cat")
    val got = ChangesFeed.sinceFiltered(spark, store, -1L, docs, "id",
        """{"cat": "hot"}""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    // exactly the latest change of every known %3 doc — including
    // tombstones (id 120: rev3 deleted at %10, 120%3==0 → passes)
    val expect = expectSince(log.filter(col("id") % 3 === 0 &&
      col("id") < 250), -1L)
    assert(got.map(r => (r._1, r._2)).toSeq == expect)
    assert(got.exists(_._3), "a matching doc's tombstone must pass the filter")
    // ids unknown to the corpus never pass, whatever the selector
    assert(got.forall(_._2 < 250))
    // a limit pages the FILTERED relation
    val page = ChangesFeed.sinceFiltered(spark, store, -1L, docs, "id",
      """{"cat": "hot"}""", limit = Some(10))
    assert(page.count() == 10 &&
      page.collect().map(_.getLong(1)).forall(_ % 3 == 0))
  }

  test("sinceView: view-emit semi-join; conditional emission, unknown ids drop") {
    import spark.implicits._
    val (store, log) = makeStore()
    // corpus knows ids 0..249; the view EMITS only for %3 docs (the
    // condition lives inside the map phase — "map decides to emit")
    val docs = (0L until 250L).map(i => (i, if (i % 3 == 0) "hot" else "cold"))
      .toDF("id", "cat")
    val v = graft.view.View.multi(docs, col("id"),
      when(col("cat") === "hot",
        array(struct(col("cat").as("key"), col("id").as("value"))))
        .otherwise(array()))
    val got = ChangesFeed.sinceView(spark, store, -1L, v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    // identical to the equivalent selector filter: exactly the latest
    // change of every known emitting doc, tombstones included
    val expect = expectSince(log.filter(col("id") % 3 === 0 &&
      col("id") < 250), -1L)
    assert(got.map(r => (r._1, r._2)).toSeq == expect)
    assert(got.exists(_._3), "an emitting doc's tombstone must pass")
    // ids the view's corpus does not know emit nothing → never pass
    assert(got.forall(_._2 < 250))
    // agrees with sinceFiltered on the same condition; limit pages
    assert(ChangesFeed.sinceView(spark, store, -1L, v, limit = Some(10))
      .collect().map(_.getLong(1)).toSeq ==
      ChangesFeed.sinceFiltered(spark, store, -1L, docs, "id",
        """{"cat": "hot"}""", limit = Some(10))
        .collect().map(_.getLong(1)).toSeq)
  }

  test("purge erases a doc's history bucket-locally, no tombstone, idempotent") {
    val (store, log) = makeStore()
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketStamp(): Map[String, Seq[(String, Long)]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(store))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_kg="))
        .map(b => b.getPath.getName ->
          fs.listStatus(b.getPath).filter(_.isFile)
            .map(f => (f.getPath.getName, f.getModificationTime)).toSeq.sortBy(_._1))
        .toMap
    val before = bucketStamp()
    val victims = Seq(7L, 120L, 295L)
    val rewritten = ChangesFeed.purge(spark, store, victims)
    // victims' changes are GONE (not tombstoned): absent from the full
    // feed, and no deleted=true row was added for them
    val feed = ChangesFeed.since(spark, store, -1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(!feed.exists(r => victims.contains(r._2)))
    // everyone else's latest change is untouched
    val expect = expectSince(log.filter(!col("id").isin(victims: _*)), -1L)
    assert(feed.map(r => (r._1, r._2)).toSeq == expect)
    // only buckets holding a victim were rewritten; the rest untouched
    val after = bucketStamp()
    val touched = rewritten.map(kb => s"_kg=$kb").toSet
    for ((b, files) <- before if !touched.contains(b))
      assert(after(b) == files, s"untouched bucket $b must not be rewritten")
    assert(touched.forall(b => after(b) != before(b)))
    // idempotent: purging the same ids again rewrites nothing
    assert(ChangesFeed.purge(spark, store, victims).isEmpty)
  }

  test("purge(DataFrame) == purge(Seq), and recovery heals a crashed swap") {
    import spark.implicits._
    val (sa, _) = makeStore()
    val (sb, _) = makeStore()
    val victimSeq = Seq(7L, 120L, 295L)
    val kbsA = ChangesFeed.purge(spark, sa, victimSeq)
    val kbsB = ChangesFeed.purge(spark, sb,
      victimSeq.toDF("doc_id")) // any column name: first column = ids
    assert(kbsA == kbsB)
    val fa = ChangesFeed.since(spark, sa, -1L).collect().toSeq
    val fb = ChangesFeed.since(spark, sb, -1L).collect().toSeq
    assert(fa == fb)
    // crash simulation: one bucket moved aside mid-swap; the next
    // purge entry restores it before locating victims
    val fs = new org.apache.hadoop.fs.Path(sb)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucket = fs.listStatus(new org.apache.hadoop.fs.Path(sb))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_kg="))
      .map(_.getPath).minBy(_.getName)
    assert(fs.rename(bucket, new org.apache.hadoop.fs.Path(sb,
      "_old_purge_" + bucket.getName)))
    val kbs2 = ChangesFeed.purge(spark, sb, Seq(9999999L).toDF("id"))
    assert(kbs2.isEmpty && fs.exists(bucket))
    assert(ChangesFeed.since(spark, sb, -1L).collect().toSeq == fb,
      "feed must be whole again after recovery")
  }

  test("checkpointed replication: resume pushes only post-checkpoint work") {
    import spark.implicits._
    val d = (0L until 300L).toDF("id")
    def rev(n: Int) = concat(lit(s"$n-"),
      md5(concat(col("id").cast("string"), lit(s":$n"))))
    val base = d.select((col("id") * 3).cast("long").as("seq"), col("id"),
      rev(1).as("rev"), lit(false).as("deleted"))
    val tail = d.filter(col("id") % 5 === 0)
      .select((lit(900L) + col("id")).cast("long").as("seq"), col("id"),
        rev(3).as("rev"), (col("id") % 10 === 0).as("deleted"))
    val dir = java.nio.file.Files.createTempDirectory("chgck").toString
    val store = s"$dir/feed"
    ChangesFeed.write(base, store, width = 64)

    // fresh replication: no checkpoint yet, full base pushed
    assert(ChangesFeed.readCheckpoint(spark, store, "repA") == -1L)
    val empty = Seq.empty[(Long, String)].toDF("id", "rev")
    val push1 = ChangesFeed.resumeDelta(spark, store, "repA", empty)
    assert(push1.count() == 300)
    val ck1 = ChangesFeed.checkpointAfter(spark, store, "repA", push1)
    assert(ck1 == 299 * 3 &&
      ChangesFeed.readCheckpoint(spark, store, "repA") == ck1)

    // more writes land; round 2 pushes EXACTLY the tail generation,
    // even against a target that (still) lacks most of the base —
    // resumption is checkpoint-driven, not target-diff-driven
    ChangesFeed.append(tail, store)
    val push2 = ChangesFeed.resumeDelta(spark, store, "repA", empty)
    val rows2 = push2.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows2.length == 60 && rows2.forall(_._1 >= 900L))
    val ck2 = ChangesFeed.checkpointAfter(spark, store, "repA", push2)
    assert(ck2 == 900L + 295L)

    // converged: empty round leaves the checkpoint untouched
    val push3 = ChangesFeed.resumeDelta(spark, store, "repA", empty)
    assert(push3.count() == 0)
    assert(ChangesFeed.checkpointAfter(spark, store, "repA", push3) == ck2)

    // checkpoints are per-replication-id; ids must be non-empty
    assert(ChangesFeed.readCheckpoint(spark, store, "repB") == -1L)
    intercept[IllegalArgumentException](
      ChangesFeed.readCheckpoint(spark, store, ""))
  }

  test("sinceStyleAllDocs reports all leaf revs; winner resolves the row") {
    import spark.implicits._
    val (store, log) = makeStore()
    // rev trees for ids < 200 only: a live main leaf at pos 9 and, for
    // %3 ids, a DELETED branch tip at pos 9 — tombstone leaves must
    // still appear in `changes` while the live leaf wins the row
    val d = (0L until 200L).toDF("id")
    val main = d.select(col("id"), lit(9L).as("pos"),
      md5(concat(col("id").cast("string"), lit(":m"))).as("hash"),
      lit(false).as("del"))
    val branch = d.filter(col("id") % 3 === 0)
      .select(col("id"), lit(9L).as("pos"),
        md5(concat(col("id").cast("string"), lit(":c"))).as("hash"),
        lit(true).as("del"))
    val leaves = main.unionByName(branch)

    val got = ChangesFeed.sinceStyleAllDocs(spark, store, -1L, leaves,
      col("id"), col("pos"), col("hash"), col("del")).collect()
    assert(got.length == 300)
    val byId = got.map(r => r.getLong(1) -> r).toMap
    val mainHash = (i: Long) => org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$i:m")
    val branchHash = (i: Long) => org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$i:c")
    (0L until 200L).foreach { i =>
      val r = byId(i)
      val changes = r.getSeq[String](4)
      if (i % 3 == 0) {
        assert(changes == Seq(s"9-${branchHash(i)}", s"9-${mainHash(i)}")
          .sorted, s"id $i changes $changes")
        // live beats deleted regardless of hash order
        assert(r.getString(2) == s"9-${mainHash(i)}" && !r.getBoolean(3))
      } else {
        assert(changes == Seq(s"9-${mainHash(i)}"))
        assert(r.getString(2) == s"9-${mainHash(i)}")
      }
    }
    // no tree known: the row falls back to its own logged rev
    (200L until 300L).foreach { i =>
      val r = byId(i)
      assert(r.getSeq[String](4) == Seq(r.getString(2)))
    }
    // seq/order: identical to the plain feed's
    val plain = ChangesFeed.since(spark, store, -1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == plain)
  }

  test("descending since: newest first, limit keeps the LATEST changes") {
    val (store, log) = makeStore()
    val desc = ChangesFeed.since(spark, store, 450L, None, descending = true)
      .select("seq", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(desc.toSeq == expectSince(log, 450L).reverse,
      "descending must be the exact reverse of the ascending read")
    val tail5 = ChangesFeed.since(spark, store, 450L, Some(5),
      descending = true).select("seq").collect().map(_.getLong(0))
    assert(tail5.toSeq == expectSince(log, 450L).reverse.take(5).map(_._1),
      "limit must keep the latest changes, not the earliest")
    // the limited read plans as a TakeOrdered, not a global sort
    val plan = ChangesFeed.since(spark, store, 450L, Some(5),
      descending = true).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
  }

  test("sinceDocIds: literal list pushes an In filter, DataFrame form agrees") {
    import spark.implicits._
    val (store, log) = makeStore()
    val watch: Seq[Any] = Seq(0L, 17L, 34L, 51L, 68L, 85L)
    val got = ChangesFeed.sinceDocIds(spark, store, 450L, watch)
    val rows = got.select("seq", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == expectSince(log, 450L).filter(p => watch.contains(p._2)),
      "doc_ids feed must be the since feed restricted to the watchlist")
    // the id list must reach the scan as a pushed data filter
    got.collect()
    val scans = collect(got.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.head.dataFilters.exists(_.toString.contains("id")),
      s"id IN (...) not pushed: ${scans.head.dataFilters}")
    assert(scans.head.partitionFilters.exists(_.toString.contains("_kg")),
      "seq-bucket pruning must survive the id restriction")
    // the relation overload returns the same rows
    val viaDf = ChangesFeed.sinceDocIds(spark, store, 450L,
      watch.map(_.asInstanceOf[Long]).toDF("id"), None)
      .select("seq", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaDf == rows)
  }

  test("sinceDesignDocs: prefix cut pushed, tombstoned ddocs pass") {
    import spark.implicits._
    val rows = Seq(
      (1L, "_design/a", "1-x", false),
      (2L, "doc1", "1-y", false),
      (3L, "_design/b", "1-z", false),
      (4L, "_design/a", "2-x", false), // update: dedup keeps this
      (5L, "doc2", "1-w", false),
      (6L, "_design/b", "2-z", true)) // ddoc REMOVAL must pass
      .toDF("seq", "id", "rev", "deleted")
    val dir = java.nio.file.Files.createTempDirectory("chg-dd").toString
    val store = s"$dir/feed"
    ChangesFeed.write(rows, store, width = 4)
    val got = ChangesFeed.sinceDesignDocs(spark, store, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3)))
      .toSeq
    assert(got == Seq((4L, "_design/a", false), (6L, "_design/b", true)),
      s"design feed wrong: $got")
    // a checkpoint past the last design change reports nothing
    assert(ChangesFeed.sinceDesignDocs(spark, store, 6L).isEmpty)
    // the namespace cut reaches the scan as a pushed data filter
    // (grouping-key predicates commute with the per-id dedup)
    val q = ChangesFeed.sinceDesignDocs(spark, store, 0L)
    q.collect()
    val scans = collect(q.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.head.dataFilters.exists(
      _.toString.contains("StartsWith")),
      s"StartsWith not pushed: ${scans.head.dataFilters}")
  }

  test("sinceWithDocs: doc struct attached, null for unknown ids, nested pruning") {
    import spark.implicits._
    val (store, log) = makeStore()
    // corpus covers only even ids -> odd-id changes report doc = null
    val corpus = (0L until 300L by 2).map(i => (i, s"body$i", i * 10))
      .toDF("cid", "body", "score")
    val got = ChangesFeed.sinceWithDocs(spark, store, 890L, corpus, $"cid")
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(1)
      val doc = r.getStruct(4)
      if (id % 2 == 0) assert(doc.getString(1) == s"body$id")
      else assert(doc == null, s"odd id $id must carry a null doc")
    }
    // order is the feed's
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
    // projecting ONE struct field prunes the corpus scan to that field
    val pruned = ChangesFeed.sinceWithDocs(spark, store, 890L, corpus,
      $"cid").select($"seq", $"doc.body")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("score") || !plan.split("ReadSchema").exists(
      seg => seg.contains("score")), s"corpus scan not pruned:\n$plan")
  }
}
