package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Replication
import graft.sources.ChangesFeed

class ReplicationSpec extends SparkSpecBase {
  import spark.implicits._

  private def leavesDf(rows: Seq[(String, Long, String, Boolean,
      Seq[String])]): DataFrame =
    rows.toDF("id", "rev_pos", "rev_hash", "deleted", "ancestors")

  private def leafSet(df: DataFrame): Set[(String, String, Boolean)] =
    df.collect().map(r => (r.getString(0),
      s"${r.getLong(1)}-${r.getString(2)}", r.getBoolean(3))).toSet

  private val cols = (col("id"), col("rev_pos"), col("rev_hash"),
    col("deleted"), col("ancestors"))

  test("applyBulkDocs: extend prunes the old tip, divergence keeps both, idempotent") {
    val target = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d2", 2L, "mm", false, Seq("1-kk"))))
    val incoming = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),   // extends d1's branch
      ("d2", 2L, "zz", false, Seq("1-kk")),   // diverges from 2-mm
      ("d4", 1L, "nn", false, Seq.empty)))    // brand-new doc
    def apply(t: DataFrame): DataFrame =
      Replication.applyBulkDocs(t, cols._1, cols._2, cols._3, cols._4,
        cols._5, incoming, cols._1, cols._2, cols._3, cols._4, cols._5)
    val once = apply(target)
    assert(leafSet(once) == Set(
      ("d1", "2-bb", false), ("d2", "2-mm", false), ("d2", "2-zz", false),
      ("d4", "1-nn", false)))
    // new_edits=false is idempotent: re-applying the same batch is a no-op
    assert(leafSet(apply(once)) == leafSet(once))
  }

  test("bulkDocs new_edits=true: winner-gated edits, tombstone recreate, conflicts leave the tree alone") {
    val target = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),           // live winner 1-aa
      ("d2", 2L, "dd", true, Seq("1-ee")),          // tombstone winner
      ("d3", 2L, "tt", false, Seq("1-kk"))))        // live winner 2-tt
    val writes = Seq(
      ("d1", "1-aa", "bodyA", false),  // edits the winner -> ok
      ("d2", null, "bodyB", false),    // recreate deleted doc -> ok
      ("d3", "1-kk", "bodyC", false),  // stale base -> conflict
      ("d4", null, "bodyD", false),    // brand-new -> ok at pos 1
      ("d5", "7-zz", "bodyE", false))  // base rev doesn't exist -> conflict
      .toDF("id", "base", "body", "del")
    val r = Replication.bulkDocs(target, cols._1, cols._2, cols._3,
      cols._4, cols._5, writes, col("id"), col("base"), col("body"),
      col("del"))
    def h(id: String, pos: Long, body: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$id:$pos:$body".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val rep = r.report.orderBy("id").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)))
    assert(rep.toSeq == Seq(
      ("d1", "ok", s"2-${h("d1", 2, "bodyA")}"),
      ("d2", "ok", s"3-${h("d2", 3, "bodyB")}"),
      ("d3", "conflict", null),
      ("d4", "ok", s"1-${h("d4", 1, "bodyD")}"),
      ("d5", "conflict", null)), s"report wrong: ${rep.toSeq}")
    // accepted edits extend their branches (old tips stop being
    // leaves); conflicted docs keep their trees untouched
    assert(leafSet(r.leaves) == Set(
      ("d1", s"2-${h("d1", 2, "bodyA")}", false),
      ("d2", s"3-${h("d2", 3, "bodyB")}", false),
      ("d3", "2-tt", false),
      ("d4", s"1-${h("d4", 1, "bodyD")}", false)))
    // a deleting edit mints a tombstone
    val del = Replication.bulkDocs(target, cols._1, cols._2, cols._3,
      cols._4, cols._5,
      Seq(("d1", "1-aa", "x", true)).toDF("id", "base", "body", "del"),
      col("id"), col("base"), col("body"), col("del"))
    assert(leafSet(del.leaves).contains(("d1", s"2-${h("d1", 2, "x")}", true)))
    // CouchDB's conflict RESOLUTION: an edit may target ANY current
    // leaf, not just the winner — tombstoning the losing branch is
    // the standard resolve move and must succeed
    val conflicted = leavesDf(Seq(
      ("d6", 2L, "bb", false, Seq("1-rr")),   // winner (hash bb > aa)
      ("d6", 2L, "aa", false, Seq("1-rr"))))  // losing leaf
    val resolve = Replication.bulkDocs(conflicted, cols._1, cols._2,
      cols._3, cols._4, cols._5,
      Seq(("d6", "2-aa", "", true)).toDF("id", "base", "body", "del"),
      col("id"), col("base"), col("body"), col("del"))
    assert(resolve.report.head().getString(1) == "ok",
      "editing the LOSING leaf must be accepted")
    assert(leafSet(resolve.leaves) == Set(
      ("d6", "2-bb", false),
      ("d6", s"3-${h("d6", 3, "")}", true)),
      "the losing branch must be tombstoned, the winner untouched")
  }

  test("replicateOnce: delta-bounded pull round, ancestor-aware revs_diff, convergence") {
    val source = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),
      ("d2", 2L, "zz", false, Seq("1-kk")),
      ("d3", 2L, "bb", false, Seq("1-aa")),        // target is AHEAD here
      ("d4", 1L, "nn", false, Seq.empty),
      ("d5", 2L, "dd", true, Seq("1-ee"))))        // tombstone travels
    val target = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d2", 2L, "mm", false, Seq("1-kk")),
      ("d3", 3L, "cc", false, Seq("2-bb", "1-aa")),
      ("d5", 1L, "ee", false, Seq.empty)))
    val dir = java.nio.file.Files.createTempDirectory("repl").toString
    val feedPath = s"$dir/feed"
    ChangesFeed.write(Seq(
      (1L, "d1", "2-bb", false), (2L, "d2", "2-zz", false),
      (3L, "d3", "2-bb", false), (4L, "d4", "1-nn", false),
      (5L, "d5", "2-dd", true))
      .toDF("seq", "id", "rev", "deleted"), feedPath, width = 4)

    val round = Replication.replicateOnce(spark, feedPath, "repA",
      source, target, cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(round.pushed.count() == 5)
    val merged = round.targetLeaves
    assert(leafSet(merged) == Set(
      ("d1", "2-bb", false),
      ("d2", "2-mm", false), ("d2", "2-zz", false),
      // the target's superseding 3-cc knows 2-bb as an ancestor:
      // NOT a miss, NOT a spurious conflict
      ("d3", "3-cc", false),
      ("d4", "1-nn", false),
      ("d5", "2-dd", true)))
    // ancestors survive the merge for the NEXT round's revs_diff
    val d1Anc = merged.filter(col("id") === "d1")
      .select("ancestors").as[Seq[String]].head()
    assert(d1Anc == Seq("1-aa"))

    // write-then-checkpoint: advance past the pushed batch, and the
    // next round is empty (convergence) with the target unchanged
    val seq = ChangesFeed.checkpointAfter(spark, feedPath, "repA",
      round.pushed)
    assert(seq == 5L)
    val round2 = Replication.replicateOnce(spark, feedPath, "repA",
      source, merged, cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(round2.pushed.count() == 0)
    assert(leafSet(round2.targetLeaves) == leafSet(merged))

    // re-running the FIRST round before checkpointing would also have
    // been safe: the merge is idempotent (spec above), and a second
    // independent replication id starts from the beginning
    val fresh = Replication.replicateOnce(spark, feedPath, "repB",
      source, merged, cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(fresh.pushed.count() == 5)
    assert(leafSet(fresh.targetLeaves) == leafSet(merged))
  }

  test("syncBatch: touched buckets only, idempotent, equals mergeReplicas") {
    import graft.view.IndexStore
    val nDocs = 60
    val source = leavesDf((0 until nDocs).map { i =>
      (s"d$i", 2L, s"s$i", i % 9 == 0, Seq(s"1-a$i"))
    })
    val targetInit = leavesDf((0 until nDocs).map { i =>
      (s"d$i", 1L, s"a$i", false, Seq.empty[String])
    })
    val dir = java.nio.file.Files.createTempDirectory("repl-sync").toString
    val path = s"$dir/target"
    Replication.createTarget(spark, path, targetInit, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 8)
    // sync a 5-doc delta: only the buckets holding those ids rewrite
    val delta = (0 until 5).map(i => s"d${i * 11}")
    val before = IndexStore.readMeta(spark, path).updateSeq
    val touched = Replication.syncBatch(spark, path, source, cols._1,
      cols._2, cols._3, cols._4, cols._5, delta.toDF("id"))
    assert(touched.nonEmpty && touched.size <= 5,
      s"a 5-doc delta may touch at most 5 buckets, touched $touched")
    val after1 = leafSet(Replication.openTarget(spark, path))
    val expect = (0 until nDocs).map { i =>
      if (delta.contains(s"d$i")) (s"d$i", s"2-s$i", i % 9 == 0)
      else (s"d$i", s"1-a$i", false)
    }.toSet
    assert(after1 == expect)
    assert(IndexStore.readMeta(spark, path).updateSeq == before + 1)
    // a checkpoint-retry of the same batch converges (idempotent)
    Replication.syncBatch(spark, path, source, cols._1, cols._2,
      cols._3, cols._4, cols._5, delta.toDF("id"))
    assert(leafSet(Replication.openTarget(spark, path)) == expect)
    // syncing EVERY id equals the one-shot replica merge's leaf set
    Replication.syncBatch(spark, path, source, cols._1, cols._2,
      cols._3, cols._4, cols._5,
      (0 until nDocs).map(i => s"d$i").toDF("id"))
    val full = leafSet(Replication.openTarget(spark, path))
    val viaMerge = graft.operators.Revisions.mergeReplicas(targetInit,
      source, cols._1, cols._2, cols._3, cols._4, cols._5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(full.map(t => (t._1, t._2)) == viaMerge,
      "synced store must agree with mergeReplicas on every winner/leaf")
  }

  test("bulkDocsStore: touched buckets only, equals the relation form, duplicate ids enforced") {
    import graft.view.IndexStore
    val nDocs = 60
    val targetInit = leavesDf((0 until nDocs).map { i =>
      (s"d$i", 1L, s"a$i", false, Seq.empty[String])
    })
    val dir = java.nio.file.Files.createTempDirectory("repl-bds").toString
    val path = s"$dir/target"
    Replication.createTarget(spark, path, targetInit, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 8)
    val writes = Seq(
      ("d0", "1-a0", "bodyA", false),   // edits the winner -> ok
      ("d11", "1-zz", "x", false),      // wrong base -> conflict
      ("d22", null, "y", false),        // create over live -> conflict
      ("dNew", null, "z", false))       // brand-new -> ok
      .toDF("id", "base", "body", "del")
    // record every untouched bucket file before the batch
    def files(): Map[String, Long] = {
      val base = new java.io.File(s"$path/data")
      base.listFiles().filter(_.isDirectory).flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())
      }.toMap
    }
    val before = files()
    val r = Replication.bulkDocsStore(spark, path, writes, col("id"),
      col("base"), col("body"), col("del"))
    assert(r.buckets.nonEmpty && r.buckets.size <= 4,
      s"a 4-write batch may touch at most 4 buckets, got ${r.buckets}")
    // untouched bucket directories keep their exact files
    val after = files()
    val touchedDirs = r.buckets.map(b => s"_b=$b").toSet
    val untouchedBefore = before.filterNot { case (p, _) =>
      touchedDirs.exists(p.contains) }
    untouchedBefore.foreach { case (p, m) =>
      assert(after.get(p).contains(m),
        s"untouched bucket file rewritten or removed: $p") }
    // the report and post-state equal the relation form's
    val rel = Replication.bulkDocs(targetInit, cols._1, cols._2, cols._3,
      cols._4, cols._5, writes, col("id"), col("base"), col("body"),
      col("del"))
    def rep(df: DataFrame): Seq[(String, String, String)] =
      df.orderBy("id").collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
    assert(rep(r.report) == rep(rel.report))
    assert(leafSet(Replication.openTarget(spark, path)) ==
      leafSet(rel.leaves))
    assert(IndexStore.readMeta(spark, path).updateSeq == 1L)

    // duplicate write ids: ONE deterministic winner is judged, the
    // rest report conflict — on the store path and the relation path
    // identically
    val dup = Seq(
      ("d1", "1-a1", "first", false),
      ("d1", "1-a1", "second", false))
      .toDF("id", "base", "body", "del")
    val rd = Replication.bulkDocsStore(spark, path, dup, col("id"),
      col("base"), col("body"), col("del"))
    val statuses = rd.report.collect().map(_.getString(1)).sorted.toSeq
    assert(statuses == Seq("conflict", "ok"),
      s"duplicate-id batch must accept exactly one write: $statuses")
    // the winner is deterministic: lowest (base, deleted, body)
    val okRev = rd.report.filter(col("status") === "ok")
      .head().getString(2)
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest("d1:2:first".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(okRev == s"2-$h", "the lowest-body duplicate must win")
    // duplicate (id, rev) target rows never fan the report out
    val dupTarget = leavesDf(Seq(
      ("e1", 1L, "aa", false, Seq.empty),
      ("e1", 1L, "aa", false, Seq.empty)))
    val rf = Replication.bulkDocs(dupTarget, cols._1, cols._2, cols._3,
      cols._4, cols._5,
      Seq(("e1", "1-aa", "b", false)).toDF("id", "base", "body", "del"),
      col("id"), col("base"), col("body"), col("del"))
    assert(rf.report.count() == 1L,
      "duplicate (id, rev) leaf rows must collapse before the join")

    // a first batch CREATES the store
    val fresh = s"$dir/fresh"
    val rc = Replication.bulkDocsStore(spark, fresh,
      Seq(("n1", null, "b1", false)).toDF("id", "base", "body", "del"),
      col("id"), col("base"), col("body"), col("del"))
    assert(rc.report.head().getString(1) == "ok")
    assert(leafSet(Replication.openTarget(spark, fresh)).map(_._1) ==
      Set("n1"))
  }

  test("replicateFilteredOnce: matching delta travels, rejected changes checkpoint, selector keys the id") {
    val source = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),
      ("d2", 2L, "zz", false, Seq("1-kk")),
      ("d4", 1L, "nn", false, Seq.empty),
      ("d5", 2L, "dd", true, Seq("1-ee"))))
    val target = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d2", 2L, "mm", false, Seq("1-kk")),
      ("d5", 1L, "ee", false, Seq.empty)))
    val docs = Seq(("d1", "x"), ("d2", "y"), ("d4", "x"), ("d5", "y"))
      .toDF("id", "kind")
    val dir = java.nio.file.Files.createTempDirectory("repl-f").toString
    val feedPath = s"$dir/feed"
    ChangesFeed.write(Seq(
      (1L, "d1", "2-bb", false), (2L, "d2", "2-zz", false),
      (3L, "d4", "1-nn", false), (4L, "d5", "2-dd", true))
      .toDF("seq", "id", "rev", "deleted"), feedPath, width = 4)
    val sel = """{"kind": {"$eq": "x"}}"""

    val r = Replication.replicateFilteredOnce(spark, feedPath, "rf",
      sel, docs, "id", source, target, cols._1, cols._2, cols._3,
      cols._4, cols._5)
    assert(r.scanned.count() == 4 && r.pushed.count() == 2)
    // only d1/d4 traveled: d2 keeps its single local leaf, d5 is NOT
    // tombstoned (the filter rejected its delete)
    assert(leafSet(r.targetLeaves) == Set(
      ("d1", "2-bb", false), ("d2", "2-mm", false),
      ("d4", "1-nn", false), ("d5", "1-ee", false)))

    // the checkpoint advances past REJECTED changes too, under the
    // selector-derived id — the next round scans nothing
    val effId = Replication.filteredRepId("rf", sel)
    assert(effId != Replication.filteredRepId("rf", """{"kind": "y"}"""))
    ChangesFeed.checkpointAfter(spark, feedPath, effId, r.scanned)
    val r2 = Replication.replicateFilteredOnce(spark, feedPath, "rf",
      sel, docs, "id", source, r.targetLeaves, cols._1, cols._2,
      cols._3, cols._4, cols._5)
    assert(r2.scanned.count() == 0)
    assert(leafSet(r2.targetLeaves) == leafSet(r.targetLeaves))
    // a DIFFERENT selector restarts from seq 0: its checkpoint key is
    // its own — the full feed is re-scanned, nothing silently skipped
    val r3 = Replication.replicateFilteredOnce(spark, feedPath, "rf",
      """{"kind": {"$eq": "y"}}""", docs, "id", source, target,
      cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(r3.scanned.count() == 4 && r3.pushed.count() == 2)
    assert(leafSet(r3.targetLeaves).contains(("d5", "2-dd", true)))
  }

  test("replicateDocIdsOnce: listed ids only, deletes DO travel, edited list restarts") {
    val source = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),
      ("d2", 2L, "zz", false, Seq("1-kk")),
      ("d4", 1L, "nn", false, Seq.empty),
      ("d5", 2L, "dd", true, Seq("1-ee"))))   // a DELETE of a listed id
    val target = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d2", 2L, "mm", false, Seq("1-kk")),
      ("d5", 1L, "ee", false, Seq.empty)))
    val dir = java.nio.file.Files.createTempDirectory("repl-di").toString
    val feedPath = s"$dir/feed"
    ChangesFeed.write(Seq(
      (1L, "d1", "2-bb", false), (2L, "d2", "2-zz", false),
      (3L, "d4", "1-nn", false), (4L, "d5", "2-dd", true))
      .toDF("seq", "id", "rev", "deleted"), feedPath, width = 4)
    val ids = Seq("d1", "d5")
    val r = Replication.replicateDocIdsOnce(spark, feedPath, "rd", ids,
      source, target, cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(r.scanned.count() == 4 && r.pushed.count() == 2)
    // d1 extends, d5's TOMBSTONE travels (no known-body caveat — the
    // cut is id-keyed, unlike a content selector), d2/d4 untouched
    assert(leafSet(r.targetLeaves) == Set(
      ("d1", "2-bb", false), ("d2", "2-mm", false),
      ("d5", "2-dd", true)))
    // checkpoint past the whole scanned region; second round scans 0
    val effId = Replication.docIdsRepId("rd", ids)
    assert(effId == Replication.docIdsRepId("rd", Seq("d5", "d1", "d1")),
      "the list canonicalizes (sorted, distinct) before hashing")
    assert(effId != Replication.docIdsRepId("rd", Seq("d1", "d2")))
    ChangesFeed.checkpointAfter(spark, feedPath, effId, r.scanned)
    val r2 = Replication.replicateDocIdsOnce(spark, feedPath, "rd", ids,
      source, r.targetLeaves, cols._1, cols._2, cols._3, cols._4,
      cols._5)
    assert(r2.scanned.count() == 0 && r2.pushed.count() == 0)
    // an EDITED list keys its own checkpoint: full re-scan, d2 travels
    val r3 = Replication.replicateDocIdsOnce(spark, feedPath, "rd",
      Seq("d2"), source, target, cols._1, cols._2, cols._3, cols._4,
      cols._5)
    assert(r3.scanned.count() == 4 && r3.pushed.count() == 1)
    assert(leafSet(r3.targetLeaves).contains(("d2", "2-zz", false)))
    intercept[IllegalArgumentException] {
      Replication.replicateDocIdsOnce(spark, feedPath, "rd", Nil,
        source, target, cols._1, cols._2, cols._3, cols._4, cols._5)
    }
  }

  test("ReplicatorDoc doc_ids: sweep syncs only listed ids; selector+doc_ids rejected") {
    val source = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),
      ("d2", 2L, "zz", false, Seq("1-kk")),
      ("d4", 1L, "nn", false, Seq.empty)))
    val dir = java.nio.file.Files.createTempDirectory("repl-dd").toString
    val feedPath = s"$dir/feed"
    ChangesFeed.write(Seq(
      (1L, "d1", "2-bb", false), (2L, "d2", "2-zz", false),
      (3L, "d4", "1-nn", false))
      .toDF("seq", "id", "rev", "deleted"), feedPath, width = 4)
    val tgt = s"$dir/tgt"
    val sched = Replication.runReplicatorDocs(spark, Seq(
        Replication.ReplicatorDoc("j1", feedPath, source, tgt,
          numBuckets = 2, docIds = Seq("d1", "d4"))),
      cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(sched.head().getString(1) == "completed")
    val stored = Replication.openTarget(spark, tgt)
      .select(col("id")).as[String].collect().toSet
    assert(stored == Set("d1", "d4"), s"only listed ids sync: $stored")
    // the sweep mirrors its checkpoint as a _local doc on the TARGET
    // (the PouchDB-visible shape), keyed by the EFFECTIVE rep id
    val lcl = Replication.localDocs(spark, tgt).collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq
    val effId = Replication.docIdsRepId("j1", Seq("d1", "d4"))
    assert(lcl == Seq((s"_local/$effId", """{"last_seq":3}""")),
      s"target _local checkpoint missing: $lcl")
    // a second sweep is a checkpointed no-op
    val again = Replication.runReplicatorDocs(spark, Seq(
        Replication.ReplicatorDoc("j1", feedPath, source, tgt,
          numBuckets = 2, docIds = Seq("d1", "d4"))),
      cols._1, cols._2, cols._3, cols._4, cols._5).head()
    assert(again.getLong(2) == 0L, "second sweep must scan nothing")
    val docs = Seq(("d1", "x")).toDF("id", "kind")
    intercept[IllegalArgumentException] {
      Replication.runReplicatorDocs(spark, Seq(
          Replication.ReplicatorDoc("j2", feedPath, source, tgt,
            selector = Some((docs, "id", """{"kind": "x"}""")),
            docIds = Seq("d1"))),
        cols._1, cols._2, cols._3, cols._4, cols._5)
    }
  }

  test("schedulerJobs + activeTasks: poll-only state, one stat per job") {
    val source = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),
      ("d2", 2L, "zz", false, Seq("1-kk"))))
    val dir = java.nio.file.Files.createTempDirectory("repl-sj").toString
    val feedPath = s"$dir/feed"
    ChangesFeed.write(Seq(
      (3L, "d1", "2-bb", false), (7L, "d2", "2-zz", false))
      .toDF("seq", "id", "rev", "deleted"), feedPath, width = 4)
    val tgt = s"$dir/tgt"
    val rd = Seq(Replication.ReplicatorDoc("job", feedPath, source, tgt,
      numBuckets = 2))
    val before = Replication.schedulerJobs(spark, rd).head()
    assert(before.getLong(1) == 0L && before.getLong(2) == 7L &&
      before.getLong(3) == 7L && before.getString(4) == "pending" &&
      before.getLong(5) == -1L,
      s"pre-sweep job state wrong: $before")
    Replication.runReplicatorDocs(spark, rd, cols._1, cols._2, cols._3,
      cols._4, cols._5)
    val after = Replication.schedulerJobs(spark, rd).head()
    assert(after.getLong(1) == 7L && after.getLong(3) == 0L &&
      after.getString(4) == "idle" && after.getLong(5) >= 0L)
    val tasks = Replication.activeTasks(spark, rd).head()
    assert(tasks.getString(0) == "replication" &&
      tasks.getLong(5) == 100L)
    intercept[IllegalArgumentException] {
      Replication.activeTasks(spark)
    }
  }

  test("sync: one bidirectional round leaves both sides the mergeReplicas answer") {
    val a = leavesDf(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),   // ahead of b
      ("d2", 2L, "zz", false, Seq("1-kk")),   // diverges from b
      ("d4", 1L, "nn", false, Seq.empty)))    // only on a
    val b = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d2", 2L, "mm", false, Seq("1-kk")),
      ("d5", 1L, "ee", false, Seq.empty)))    // only on b
    val dir = java.nio.file.Files.createTempDirectory("repl-sync2").toString
    def feed(df: DataFrame, p: String): String = {
      ChangesFeed.write(df.select(
        monotonically_increasing_id().as("seq"), col("id"),
        concat(col("rev_pos"), lit("-"), col("rev_hash")).as("rev"),
        col("deleted")), p, width = 4)
      p
    }
    val r = Replication.sync(spark, feed(a, s"$dir/fa"),
      feed(b, s"$dir/fb"), "s1", a, b, cols._1, cols._2, cols._3,
      cols._4, cols._5)
    val expect = Set(
      ("d1", "2-bb", false), ("d2", "2-mm", false), ("d2", "2-zz", false),
      ("d4", "1-nn", false), ("d5", "1-ee", false))
    assert(leafSet(r.aLeaves) == expect)
    assert(leafSet(r.bLeaves) == expect)
    val viaMerge = graft.operators.Revisions.mergeReplicas(a, b,
      cols._1, cols._2, cols._3, cols._4, cols._5)
      .collect().map(_.getString(0)).toSet
    assert(leafSet(r.aLeaves).map(_._1) == viaMerge)
    // per-direction checkpoints: after both advance, the next round
    // moves nothing in either direction
    ChangesFeed.checkpointAfter(spark, s"$dir/fa", "s1:a->b", r.pushedToB)
    ChangesFeed.checkpointAfter(spark, s"$dir/fb", "s1:b->a", r.pushedToA)
    val r2 = Replication.sync(spark, s"$dir/fa", s"$dir/fb", "s1",
      r.aLeaves, r.bLeaves, cols._1, cols._2, cols._3, cols._4, cols._5)
    assert(r2.pushedToB.count() == 0 && r2.pushedToA.count() == 0)
  }

  test("maintainReplication: streamed micro-batches converge the persisted target") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val source = leavesDf((0 until 40).map { i =>
      (s"m$i", 2L, s"s$i", false, Seq(s"1-a$i"))
    })
    val dir = java.nio.file.Files.createTempDirectory("repl-str").toString
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.maintainReplication(spark,
      in.toDF().toDF("seq", "id"), source, cols._1, cols._2, cols._3,
      cols._4, cols._5, s"$dir/target", s"$dir/ckpt", numBuckets = 4)
    try {
      in.addData((0 until 15).map(i => (i.toLong, s"m$i")): _*)
      q.processAllAvailable()
      assert(leafSet(Replication.openTarget(spark, s"$dir/target")) ==
        (0 until 15).map(i => (s"m$i", s"2-s$i", false)).toSet)
      in.addData((15 until 40).map(i => (i.toLong, s"m$i")): _*)
      q.processAllAvailable()
      assert(leafSet(Replication.openTarget(spark, s"$dir/target")) ==
        (0 until 40).map(i => (s"m$i", s"2-s$i", false)).toSet)
      // the syncBatch body keeps the count cache current through
      // STREAMED writes too — no scan ever needed at poll time
      val m = graft.view.IndexStore.readMeta(spark, s"$dir/target")
      assert(m.countsSeq == m.updateSeq && m.docCount == 40L &&
        m.delCount == 0L, s"streamed count cache drifted: $m")
    } finally q.stop()
  }

  test("maintainFilteredReplication: only selector-matching ids sync per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val n = 30
    val source = leavesDf((0 until n).map { i =>
      (s"f$i", 2L, s"s$i", false, Seq(s"1-a$i"))
    })
    val docs = (0 until n).map(i =>
      (s"f$i", if (i % 3 == 0) "keep" else "drop")).toDF("id", "kind")
    val dir = java.nio.file.Files.createTempDirectory("repl-fstr").toString
    // pre-created target: rev 1 of every doc
    Replication.createTarget(spark, s"$dir/target",
      leavesDf((0 until n).map(i =>
        (s"f$i", 1L, s"a$i", false, Seq.empty[String]))),
      cols._1, cols._2, cols._3, cols._4, cols._5, numBuckets = 4)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.maintainFilteredReplication(spark,
      in.toDF().toDF("seq", "id"), source, cols._1, cols._2, cols._3,
      cols._4, cols._5, docs, "id", """{"kind": {"$eq": "keep"}}""",
      s"$dir/target", s"$dir/ckpt", numBuckets = 4)
    try {
      in.addData((0 until n).map(i => (i.toLong, s"f$i")): _*)
      q.processAllAvailable()
      val got = leafSet(Replication.openTarget(spark, s"$dir/target"))
      val expect = (0 until n).map { i =>
        if (i % 3 == 0) (s"f$i", s"2-s$i", false)
        else (s"f$i", s"1-a$i", false)
      }.toSet
      assert(got == expect,
        "matching ids must upgrade, non-matching keep target leaves")
    } finally q.stop()
  }

  test("reshardTarget: shuffle-free bucket split, seq preserved, store re-serves") {
    import graft.view.IndexStore
    val nDocs = 120
    val leaves = leavesDf((0 until nDocs).map { i =>
      (s"d$i", 1L, s"a$i", i % 9 == 0, Seq.empty[String])
    })
    val dir = java.nio.file.Files.createTempDirectory("repl-rsh").toString
    val path = s"$dir/target"
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 8, seq = 5L)
    val before = leafSet(Replication.openTarget(spark, path))

    // the rewrite frame reshard runs has NO Exchange: rows never
    // cross the network, each old bucket fans out to its children
    val frame = spark.read.parquet(s"$path/data").drop("_b")
      .withColumn("_b", IndexStore.idBucket(col("id"), 32))
      .sortWithinPartitions(col("_b"), col("id"), col("rev_pos"),
        col("rev_hash"))
    assert(!frame.queryExecution.executedPlan.toString.contains("Exchange"),
      "reshard's rewrite must be shuffle-free")

    val n2 = Replication.reshardTarget(spark, path, factor = 4)
    assert(n2 == 32)
    val meta = IndexStore.readMeta(spark, path)
    assert(meta.buckets == 32 && meta.updateSeq == 5L,
      "reshard is a layout change: buckets multiply, update_seq keeps")
    // 32 child directories, every row in the dir its NEW bucket says,
    // and each new bucket folds back onto its parent (pmod splitting)
    val dirs = new java.io.File(s"$path/data").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("_b="))
      .map(_.getName.stripPrefix("_b=").toInt).toSet
    val expectDirs = spark.read.parquet(s"$path/data")
      .select(IndexStore.idBucket(col("id"), 32)).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(dirs == expectDirs && dirs.forall(b => b >= 0 && b < 32),
      s"bucket dirs must be exactly the occupied 32-bucket homes: $dirs")
    val badHome = spark.read.parquet(s"$path/data")
      .filter(col("_b") =!= IndexStore.idBucket(col("id"), 32) ||
        col("_b") % 8 =!= IndexStore.idBucket(col("id"), 8))
      .count()
    assert(badHome == 0, "every row must live in its 32-bucket home, " +
      "which must fold back onto its old 8-bucket home")
    // nothing lost, duplicated or re-homed
    assert(leafSet(Replication.openTarget(spark, path)) == before)
    // no stale staging/old dirs survive the swap
    assert(!new java.io.File(path + "._reshard").exists())
    assert(!new java.io.File(path + "._old").exists())

    // the resharded store still serves delta writes, bucket-bounded
    val src2 = leavesDf(Seq(("d3", 2L, "z3", false, Seq("1-a3"))))
    val touched = Replication.syncBatch(spark, path, src2, cols._1,
      cols._2, cols._3, cols._4, cols._5, Seq("d3").toDF("id"))
    assert(touched.size == 1 && touched.head < 32)
    assert(leafSet(Replication.openTarget(spark, path)) ==
      before - (("d3", "1-a3", false)) + (("d3", "2-z3", false)))

    intercept[IllegalArgumentException] {
      Replication.reshardTarget(spark, path, factor = 1)
    }
  }

  test("purgeTarget: touched buckets only, equals relation purge, vanished docs gone") {
    import graft.view.IndexStore
    val nDocs = 90
    val leaves = leavesDf((0 until nDocs).flatMap { i =>
      if (i % 3 == 0) Seq(
        (s"d$i", 2L, s"b$i", false, Seq(s"1-a$i")),
        (s"d$i", 2L, s"c$i", false, Seq(s"1-a$i"))) // conflict branch
      else Seq((s"d$i", 1L, s"a$i", false, Seq.empty[String]))
    })
    val dir = java.nio.file.Files.createTempDirectory("repl-prg").toString
    val path = s"$dir/target"
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 16, seq = 2L)
    // purge: d0's both branches (doc resurrects rev 1), d6's c-branch
    // only (folds), d1 entirely (vanishes), plus a non-leaf no-op
    val requests = Seq(
      ("d0", 2L, "b0"), ("d0", 2L, "c0"),
      ("d6", 2L, "c6"),
      ("d1", 1L, "a1"),
      ("d9", 1L, "a9")) // interior rev of d9 -> ignored
      .toDF("id", "rev_pos", "rev_hash")
    def files(): Map[String, Long] = {
      val base = new java.io.File(s"$path/data")
      base.listFiles().filter(_.isDirectory).flatMap(d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified())).toMap
    }
    val before = files()
    val touched = Replication.purgeTarget(spark, path, requests,
      col("id"), col("rev_pos"), col("rev_hash"))
    assert(touched.nonEmpty && touched.size <= 4,
      s"a 4-doc purge may touch at most 4 buckets, got $touched")
    val touchedDirs = touched.map(b => s"_b=$b").toSet
    files().foreach { case (p, m) =>
      if (!touchedDirs.exists(p.contains))
        assert(before.get(p).contains(m), s"untouched bucket rewritten: $p")
    }
    assert(IndexStore.readMeta(spark, path).updateSeq == 3L)
    // the store's final state == the relation-form purgeLeaves answer
    val expect = leafSet(graft.operators.Revisions.purgeLeaves(leaves,
      cols._1, cols._2, cols._3, cols._4, cols._5,
      requests, col("id"), col("rev_pos"), col("rev_hash")))
    assert(leafSet(Replication.openTarget(spark, path)) == expect)
    val got = leafSet(Replication.openTarget(spark, path))
    assert(got.contains(("d0", "1-a0", false)), "tip purge must resurrect")
    assert(!got.exists(_._1 == "d1"), "fully-purged doc must vanish")
    assert(got.contains(("d9", "2-b9", false)) &&
      got.contains(("d9", "2-c9", false)),
      "a non-current-leaf request is ignored — d9 keeps both branches")
  }

  test("compactTarget: shuffle-free revs_limit stemming, identities preserved") {
    import graft.view.IndexStore
    val leaves = leavesDf((0 until 40).map { i =>
      (s"d$i", 4L, s"t$i", i % 7 == 0,
        Seq(s"3-c$i", s"2-b$i", s"1-a$i"))
    })
    val dir = java.nio.file.Files.createTempDirectory("repl-cmp").toString
    val path = s"$dir/target"
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 8, seq = 4L)
    // the rewrite frame: same _b rides along, so no Exchange
    val frame = spark.read.parquet(s"$path/data")
      .select(col("_b"), col("id"), col("rev_pos"), col("rev_hash"),
        col("deleted"), slice(col("ancestors"), 1, 1).as("ancestors"))
    assert(!frame.queryExecution.executedPlan.toString.contains("Exchange"),
      "compaction must not shuffle")
    Replication.compactTarget(spark, path, revsLimit = 2)
    val meta = IndexStore.readMeta(spark, path)
    assert(meta.buckets == 8 && meta.updateSeq == 4L)
    val rows = Replication.openTarget(spark, path).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("ancestors").toSeq ==
        Seq(s"3-c${r.getString(0).drop(1)}"),
        s"history must stem to revs_limit - 1 entries: $r")
    }
    assert(leafSet(Replication.openTarget(spark, path)) == leafSet(leaves),
      "leaf identities must survive compaction")
    assert(!new java.io.File(path + "._compact").exists())
    assert(!new java.io.File(path + "._old").exists())
    intercept[IllegalArgumentException] {
      Replication.compactTarget(spark, path, revsLimit = 0)
    }
  }

  test("bulkDocsValidated: forbidden writes report all reasons and touch nothing") {
    val target = leavesDf(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d2", 1L, "bb", false, Seq.empty)))
    val writes = Seq(
      ("d1", "1-aa", "okbody", 200L, "en"),   // valid edit -> ok
      ("d2", "1-bb", "short", 10L, "en"),     // fails min_len
      ("d3", null, "x", 10L, "xx"),           // fails both rules
      ("d4", null, "newdoc", 500L, "de"))     // valid create -> ok
      .toDF("id", "base", "body", "n", "lang")
    val rules = Seq(
      "min_len" -> """{"n": {"$gte": 100}}""",
      "lang_known" -> """{"lang": {"$in": ["en", "de"]}}""")
    val res = Replication.bulkDocsValidated(target, cols._1, cols._2,
      cols._3, cols._4, cols._5, writes, col("id"), col("base"),
      col("body"), lit(false), rules)
    val rep = res.report.collect().map(r => r.getString(0) ->
      (r.getString(1), Option(r.getString(2)), r.getString(3))).toMap
    assert(rep("d1")._1 == "ok" && rep("d1")._3 == "")
    assert(rep("d2") == (("forbidden", None, "min_len")))
    assert(rep("d3") == (("forbidden", None, "min_len,lang_known")))
    assert(rep("d4")._1 == "ok")
    // forbidden writes leave the tree untouched: d2 keeps 1-bb, no d3
    val leaves = leafSet(res.leaves)
    assert(leaves.contains(("d2", "1-bb", false)))
    assert(!leaves.exists(_._1 == "d3"))
    assert(leaves.exists(t => t._1 == "d4"))

    // the store endpoint gives the identical report (localized)
    val dir = java.nio.file.Files.createTempDirectory("repl-vdu").toString
    Replication.createTarget(spark, s"$dir/t", target, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 4)
    val sres = Replication.bulkDocsStoreValidated(spark, s"$dir/t",
      writes, col("id"), col("base"), col("body"), lit(false), rules)
    val srep = sres.report.collect().map(r => r.getString(0) ->
      (r.getString(1), Option(r.getString(2)), r.getString(3))).toMap
    assert(srep == rep, "store-form report must equal the relation form")
    assert(leafSet(Replication.openTarget(spark, s"$dir/t")) == leaves)

    intercept[IllegalArgumentException] {
      Replication.bulkDocsValidated(target, cols._1, cols._2, cols._3,
        cols._4, cols._5, writes, col("id"), col("base"), col("body"),
        lit(false), Nil)
    }
  }

  test("runReplicatorDocs: checkpointed no-op second sweep, error isolation, selector restart") {
    import graft.operators.Replication
    val dir = java.nio.file.Files.createTempDirectory("repl-sched").toString
    val n = 40
    val source = leavesDf((0 until n).map(i =>
      (s"d$i", 2L, s"s$i", false, Seq(s"1-a$i"))))
    val feedPath = s"$dir/feed"
    ChangesFeed.write(
      (0 until n).map(i => (i.toLong + 1, s"d$i", s"2-s$i", false))
        .toDF("seq", "id", "rev", "deleted"), feedPath, width = 16)
    val docsRel = (0 until n).map(i => (s"d$i", if (i % 2 == 0) "en"
      else "zz")).toDF("id", "lang")
    val selEn = """{"lang": {"$eq": "en"}}"""
    val jobs = Seq(
      Replication.ReplicatorDoc("full", feedPath, source, s"$dir/a"),
      Replication.ReplicatorDoc("filt", feedPath, source, s"$dir/b",
        selector = Some((docsRel, "id", selEn))),
      Replication.ReplicatorDoc("broken", "/nonexistent/feed", source,
        s"$dir/c"))
    val sweep1 = Replication.runReplicatorDocs(spark, jobs, cols._1,
      cols._2, cols._3, cols._4, cols._5).collect()
      .map(r => r.getString(0) -> r).toMap
    // error isolation: broken reports, the others complete
    assert(sweep1("broken").getString(1) == "error" &&
      sweep1("broken").getString(6) != null)
    assert(sweep1("full").getString(1) == "completed" &&
      sweep1("full").getLong(2) == n && sweep1("full").getLong(3) == n)
    assert(sweep1("filt").getString(1) == "completed" &&
      sweep1("filt").getLong(3) == n / 2,
      s"selector job must sync only matching docs: ${sweep1("filt")}")
    assert(leafSet(Replication.openTarget(spark, s"$dir/a")).size == n)
    assert(leafSet(Replication.openTarget(spark, s"$dir/b")).size == n / 2)
    // second sweep: checkpoints drained, nothing scanned or synced
    val sweep2 = Replication.runReplicatorDocs(spark,
      jobs.take(2), cols._1, cols._2, cols._3, cols._4, cols._5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(sweep2("full").getLong(2) == 0 && sweep2("full").getLong(3) == 0)
    assert(sweep2("filt").getLong(2) == 0)
    // an EDITED selector keys a fresh checkpoint: the feed replays
    val selAll = """{"lang": {"$in": ["en", "zz"]}}"""
    val sweep3 = Replication.runReplicatorDocs(spark, Seq(
        Replication.ReplicatorDoc("filt", feedPath, source, s"$dir/b",
          selector = Some((docsRel, "id", selAll)))),
      cols._1, cols._2, cols._3, cols._4, cols._5).collect()
    assert(sweep3.head.getLong(2) == n,
      "a changed selector must restart the feed from seq 0")
    assert(leafSet(Replication.openTarget(spark, s"$dir/b")).size == n)
    intercept[IllegalArgumentException] {
      Replication.runReplicatorDocs(spark, jobs.take(1) ++ jobs.take(1),
        cols._1, cols._2, cols._3, cols._4, cols._5)
    }
  }

  test("dbsInfo + dbUpdates: meta-sidecar admin reads over many stores") {
    val dir = java.nio.file.Files.createTempDirectory("repl-dbs").toString
    val a = leavesDf((0 until 30).map(i =>
      (s"a$i", 1L, s"h$i", i % 5 == 0, Seq.empty[String])))
    val b = leavesDf((0 until 12).map(i =>
      (s"b$i", 1L, s"g$i", false, Seq.empty[String])))
    Replication.createTarget(spark, s"$dir/a", a, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 4, seq = 3L)
    Replication.createTarget(spark, s"$dir/b", b, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 2, seq = 9L)
    val dbs = Seq("dba" -> s"$dir/a", "dbb" -> s"$dir/b")
    val info = Replication.dbsInfo(spark, dbs).orderBy("db_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(info.toSeq == Seq(("dba", 24L, 6L, 3L, 4L),
      ("dbb", 12L, 0L, 9L, 2L)))
    // catch-up semantics: since=0 replays creations in seq order;
    // a later cursor returns only stores past it — still as
    // "created" when the store's creation event itself (the meta
    // sidecar's createdSeq, stamped at first write) is past the
    // cursor, "updated" only once the creation has been consumed
    val u0 = Replication.dbUpdates(spark, dbs, since = 0L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(u0.toSeq == Seq(("dba", "created", 3L), ("dbb", "created", 9L)))
    val u5 = Replication.dbUpdates(spark, dbs, since = 5L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(u5.toSeq == Seq(("dbb", "created", 9L)),
      "a store born after the cursor reports its creation, not an update")
    // advance dba past the cursor: its creation (seq 3) is already
    // consumed at since=5, so the new changes report as an update
    graft.view.IndexStore.writeMeta(spark, s"$dir/a",
      graft.view.IndexStore.readMeta(spark, s"$dir/a").copy(updateSeq = 7L))
    val u5b = Replication.dbUpdates(spark, dbs, since = 5L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(u5b.toSeq == Seq(("dba", "updated", 7L), ("dbb", "created", 9L)))
    assert(Replication.dbUpdates(spark, dbs, since = 9L).isEmpty)
    // a store that does not exist yet simply has no update to report
    val u = Replication.dbUpdates(spark,
      dbs :+ ("ghost" -> s"$dir/ghost"), since = 0L)
    assert(u.count() == 2)
  }

  test("destroyTarget: whole-store drop, deleted event, crash heal, recreate") {
    val dir = java.nio.file.Files.createTempDirectory("repl-destroy").toString
    val a = leavesDf((0 until 8).map(i =>
      (s"a$i", 1L, s"h$i", false, Seq.empty[String])))
    val pa = s"$dir/dba"
    Replication.createTarget(spark, pa, a, cols._1, cols._2, cols._3,
      cols._4, cols._5, numBuckets = 2, seq = 5L)
    Replication.localDocsUpsert(spark, pa,
      Seq(("_local/ck", "{\"seq\":5}", false)).toDF("id", "body", "del"),
      $"id", $"body", $"del")
    val dbs = Seq("dba" -> pa)
    // destroy: event seq strictly past the last consumed update
    val ds = Replication.destroyTarget(spark, pa)
    assert(ds == 6L, s"deletedSeq must be updateSeq+1, got $ds")
    // every namespace probe is blind to the breadcrumb
    assert(!Replication.targetExists(spark, pa))
    assert(Replication.allDbs(spark, dir).isEmpty,
      "_all_dbs must not list a destroyed store")
    // _db_updates reports the deletion exactly until consumed
    val u = Replication.dbUpdates(spark, dbs, since = 5L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(u.toSeq == Seq(("dba", "deleted", 6L)), s"got ${u.toSeq}")
    assert(Replication.dbUpdates(spark, dbs, since = 6L).isEmpty,
      "a consumed delete event must not re-report")
    // idempotent: a second destroy re-reads the breadcrumb's seq
    assert(Replication.destroyTarget(spark, pa) == 6L)
    // crash heal: a store that lost the rename→breadcrumb window
    // (dir renamed, no breadcrumb) completes on retry
    val pb = s"$dir/dbb"
    Replication.createTarget(spark, pb, a, cols._1, cols._2, cols._3,
      cols._4, cols._5, numBuckets = 2, seq = 11L)
    val fs = graft.view.IndexStore.fsFor(spark, pb)
    assert(fs.rename(new org.apache.hadoop.fs.Path(pb),
      new org.apache.hadoop.fs.Path(pb + ".__deleting")))
    // MID-crash-window: the half-destroyed dir still holds a
    // _graft_meta, but it must never list as a db under the mangled
    // name — the destroy rename's whole point is that every namespace
    // probe goes blind at that instant
    assert(Replication.allDbs(spark, dir).isEmpty,
      "_all_dbs must not list a half-destroyed `.__deleting` store")
    assert(Replication.destroyTarget(spark, pb) == 12L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pb + ".__deleting")),
      "retry must clear the half-deleted dir")
    // crash between rename and breadcrumb, then RE-CREATE, then a
    // destroy of the live store: the stale half dir (its seq
    // superseded by the live meta) must not wedge the rename
    val pc = s"$dir/dbc"
    Replication.createTarget(spark, pc, a, cols._1, cols._2, cols._3,
      cols._4, cols._5, numBuckets = 2, seq = 20L)
    assert(fs.rename(new org.apache.hadoop.fs.Path(pc),
      new org.apache.hadoop.fs.Path(pc + ".__deleting")))
    Replication.createTarget(spark, pc, a, cols._1, cols._2, cols._3,
      cols._4, cols._5, numBuckets = 2, seq = 30L)
    assert(Replication.destroyTarget(spark, pc) == 31L,
      "destroy after recreate-over-stale-half must use the live seq")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pc + ".__deleting")))
    assert(Replication.dbUpdates(spark, Seq("dbb" -> pb), since = 0L)
      .collect().map(r => r.getString(1)).toSeq == Seq("deleted"))
    // recreate consumes the breadcrumb: the full CouchDB event cycle
    Replication.createTarget(spark, pa, a, cols._1, cols._2, cols._3,
      cols._4, cols._5, numBuckets = 2, seq = 9L)
    val u2 = Replication.dbUpdates(spark, dbs, since = 6L).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(u2.toSeq == Seq(("created", 9L)),
      s"recreate must report created again, got ${u2.toSeq}")
    // destroying a store that never existed is loud
    intercept[IllegalArgumentException] {
      Replication.destroyTarget(spark, s"$dir/ghost")
    }
  }

  test("local docs: counter revs, delete removes, store meta and data untouched") {
    val dir = java.nio.file.Files.createTempDirectory("repl-local").toString
    val path = s"$dir/store"
    val leaves = leavesDf((0 until 40).map(i =>
      (s"d$i", 1L, s"h$i", false, Seq.empty[String])))
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 4, seq = 9L)
    val metaBefore = graft.view.IndexStore.readMeta(spark, path)
    // empty store lists no local docs; a point read misses cleanly
    assert(Replication.localDocs(spark, path).isEmpty)
    assert(Replication.localDocGet(spark, path, "_local/x").isEmpty)
    // batch 1: three checkpoints
    val b1 = Seq(("_local/a", "s1", false), ("_local/b", "s2", false),
      ("_local/c", "s3", false)).toDF("id", "body", "del")
    val bs1 = Replication.localDocsUpsert(spark, path, b1, col("id"),
      col("body"), col("del"))
    assert(bs1.nonEmpty)
    val l1 = Replication.localDocs(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(l1 == Seq(("_local/a", "0-1", "s1"), ("_local/b", "0-1", "s2"),
      ("_local/c", "0-1", "s3")))
    // batch 2: update a (counter bumps), delete b (row removed)
    val b2 = Seq(("_local/a", "s9", false), ("_local/b", null, true))
      .toDF("id", "body", "del")
    Replication.localDocsUpsert(spark, path, b2, col("id"), col("body"),
      col("del"))
    val l2 = Replication.localDocs(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(l2 == Seq(("_local/a", "0-2", "s9"), ("_local/c", "0-1", "s3")))
    // point read prunes to one bucket and agrees with the listing
    val g = Replication.localDocGet(spark, path, "_local/a").collect()
    assert(g.length == 1 && g(0).getString(1) == "0-2" &&
      g(0).getString(2) == "s9")
    // local writes moved NOTHING in the MVCC world: meta byte-equal
    // (update_seq, purge_seq, createdSeq) and the doc relation intact
    val metaAfter = graft.view.IndexStore.readMeta(spark, path)
    assert(metaAfter.updateSeq == metaBefore.updateSeq &&
      metaAfter.purgeSeq == metaBefore.purgeSeq &&
      metaAfter.createdSeq == metaBefore.createdSeq)
    assert(Replication.openTarget(spark, path).count() == 40)
    assert(Replication.openTarget(spark, path)
      .filter(col("id").startsWith("_local")).isEmpty)
    // duplicate ids in one batch are rejected loudly
    val dup = Seq(("_local/z", "x", false), ("_local/z", "y", false))
      .toDF("id", "body", "del")
    val e = intercept[IllegalArgumentException] {
      Replication.localDocsUpsert(spark, path, dup, col("id"),
        col("body"), col("del"))
    }
    assert(e.getMessage.contains("one write per id"))
    // deleting an absent id is a clean no-op
    val del = Seq(("_local/ghost", null.asInstanceOf[String], true))
      .toDF("id", "body", "del")
    Replication.localDocsUpsert(spark, path, del, col("id"), col("body"),
      col("del"))
    assert(Replication.localDocs(spark, path).count() == 2)
    // deleting the LAST local doc in every bucket leaves local/ present
    // but partition-less — the listing must come back empty, not throw
    // schema inference
    val wipe = Seq(("_local/a", null.asInstanceOf[String], true),
      ("_local/c", null.asInstanceOf[String], true))
      .toDF("id", "body", "del")
    Replication.localDocsUpsert(spark, path, wipe, col("id"), col("body"),
      col("del"))
    assert(Replication.localDocs(spark, path).isEmpty)
    assert(Replication.localDocGet(spark, path, "_local/a").isEmpty)
  }

  test("allDbs: lists store children only, sorted, composing with dbsInfo") {
    val root = java.nio.file.Files.createTempDirectory("repl-alldbs")
      .toString + "/dbs"
    val fs = graft.view.IndexStore.fsFor(spark, root)
    // missing root lists empty, not loud
    assert(Replication.allDbs(spark, root).isEmpty)
    val leaves = leavesDf((0 until 10).map(i =>
      (s"d$i", 1L, s"h$i", false, Seq.empty[String])))
    Seq("zeta", "alpha").foreach { n =>
      Replication.createTarget(spark, s"$root/$n", leaves, cols._1,
        cols._2, cols._3, cols._4, cols._5, numBuckets = 2, seq = 1L)
    }
    // a metaless directory is NOT a database
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/_not_a_db"))
    val names = Replication.allDbs(spark, root).collect()
      .map(_.getString(0)).toSeq
    assert(names == Seq("alpha", "zeta"), s"listing wrong: $names")
    val info = Replication.dbsInfo(spark,
        names.map(n => n -> s"$root/$n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(info == Seq(("alpha", 10L), ("zeta", 10L)))
  }

  test("compact/reshard carry sidecars; purge-log trim guards stale catch-ups") {
    val dir = java.nio.file.Files.createTempDirectory("repl-side").toString
    val path = s"$dir/store"
    val leaves = leavesDf((0 until 30).map(i =>
      (s"s$i", 1L, s"h$i", false, Seq.empty[String])))
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 4, seq = 1L)
    Replication.localDocsUpsert(spark, path,
      Seq(("_local/ck", "b1", false)).toDF("id", "body", "del"),
      col("id"), col("body"), col("del"))
    def purgeOne(i: Int): Unit = Replication.purgeTarget(spark, path,
      Seq((s"s$i", 1L, s"h$i")).toDF("id", "rev_pos", "rev_hash"),
      col("id"), col("rev_pos"), col("rev_hash"))
    purgeOne(0); purgeOne(1); purgeOne(2)
    // compact: local docs and the purge log survive the dir swap
    Replication.compactTarget(spark, path, revsLimit = 2)
    assert(Replication.localDocs(spark, path).count() == 1)
    val pp = Replication.pendingPurges(spark, path, 0L)
    assert(pp.purgeSeq == 3L && pp.goneIds.toSet == Set("s0", "s1", "s2"),
      s"purge log must survive compact: $pp")
    // reshard: local docs REBUCKET to the new count; point GET routes
    Replication.reshardTarget(spark, path, factor = 2)
    val g = Replication.localDocGet(spark, path, "_local/ck").collect()
    assert(g.length == 1 && g(0).getString(2) == "b1",
      s"local doc must rebucket through reshard: ${g.toSeq}")
    assert(Replication.pendingPurges(spark, path, 0L).purgeSeq == 3L)
    // trim to the newest batch: covered catch-up fine, stale one loud
    assert(Replication.trimPurgeLog(spark, path, limit = 1) ==
      Seq(1L, 2L))
    assert(Replication.pendingPurges(spark, path, 2L).goneIds ==
      Seq("s2"))
    val e = intercept[IllegalStateException] {
      Replication.pendingPurges(spark, path, 0L)
    }
    assert(e.getMessage.contains("rebuild"))
    assert(Replication.trimPurgeLog(spark, path, limit = 1).isEmpty)
  }

  test("repairConflicts: losers tombstoned, winners frozen, idempotent") {
    import graft.operators.Revisions
    val dir = java.nio.file.Files.createTempDirectory("repl-fix").toString
    val path = s"$dir/store"
    // d1: live winner 3-cc, live loser 3-aa, deleted loser 2-dd
    // d2: all-dead (no live losers — repair must not touch it)
    // d3: clean single leaf
    val leaves = leavesDf(Seq(
      ("d1", 3L, "cc", false, Seq.empty[String]),
      ("d1", 3L, "aa", false, Seq("2-pp")),
      ("d1", 2L, "dd", true, Seq.empty[String]),
      ("d2", 2L, "xx", true, Seq.empty[String]),
      ("d2", 1L, "yy", true, Seq.empty[String]),
      ("d3", 1L, "zz", false, Seq.empty[String])))
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 4, seq = 1L)
    val bs = Replication.repairConflicts(spark, path, newSeq = 2L)
    assert(bs.nonEmpty)
    val meta = Revisions.docMeta(Replication.openTarget(spark, path),
        col("id"), col("rev_pos"), col("rev_hash"), col("deleted"))
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3),
        r.getLong(5))).toSeq
    // winners frozen, zero conflicts anywhere, d1 gained one deleted
    // conflict (the minted tombstone) beside its old 2-dd
    assert(meta == Seq(("d1", "3-cc", 0L, 2L), ("d2", "2-xx", 0L, 1L),
      ("d3", "1-zz", 0L, 0L)), s"post-repair meta wrong: $meta")
    // the minted tombstone extends the loser's path (history kept)
    val tomb = Replication.openTarget(spark, path)
      .filter(col("id") === "d1" && col("rev_pos") === 4L).head()
    assert(tomb.getBoolean(3) &&
      tomb.getSeq[String](4) == Seq("3-aa", "2-pp"),
      s"tombstone must extend the loser's own path: $tomb")
    // idempotent: a second run finds no live losers, rewrites nothing
    assert(Replication.repairConflicts(spark, path).isEmpty)
  }

  test("dbsInfo count cache: delta-maintained through writers, self-heals when stale") {
    import graft.view.IndexStore
    val dir = java.nio.file.Files.createTempDirectory("repl-cc").toString
    val path = s"$dir/store"
    def scanCounts(): (Long, Long) = {
      val r = graft.operators.Revisions.dbInfo(
        Replication.openTarget(spark, path), col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted")).head()
      (r.getLong(0), r.getLong(1))
    }
    def cached(): (Long, Long, Boolean) = {
      val m = IndexStore.readMeta(spark, path)
      (m.docCount, m.delCount, m.countsSeq == m.updateSeq)
    }
    // create: 5 live + 1 tombstone winner → (5, 1) stamped at seq 1
    val leaves = leavesDf(
      (0 until 5).map(i => (s"d$i", 1L, s"h$i", false, Seq.empty[String])) :+
        ("dead", 1L, "tt", true, Seq.empty[String]))
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 4, seq = 1L)
    assert(cached() == (5L, 1L, true))
    // interactive batch: delete d0, create d9 → (5, 2), still current
    val w = Seq(("d0", "1-h0", null.asInstanceOf[String], true),
      ("d9", null.asInstanceOf[String], "niner", false))
      .toDF("id", "base", "body", "del")
    Replication.bulkDocsStore(spark, path, w, col("id"), col("base"),
      col("body"), col("del"), newSeq = 2L)
    assert(cached() == (5L, 2L, true), s"after batch: ${cached()}")
    assert(scanCounts() == (5L, 2L), "cache must equal the scan")
    // purge d0's tombstone (no ancestors survive the purge because the
    // minted delete rev carries '1-h0' as its path — the ancestor
    // RESURRECTS live); counts move accordingly and stay current
    val mint = java.security.MessageDigest.getInstance("MD5")
      .digest("d0:2:".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val pr = Seq(("d0", 2L, mint)).toDF("id", "rev_pos", "rev_hash")
    Replication.purgeTarget(spark, path, pr, col("id"), col("rev_pos"),
      col("rev_hash"), newSeq = 3L)
    assert(cached()._3, "cache must stay current through purge")
    assert((cached()._1, cached()._2) == scanCounts(),
      s"purge delta drifted: ${cached()} vs ${scanCounts()}")
    // stale stamp (out-of-band writer): info still right, then healed
    IndexStore.writeMeta(spark, path, IndexStore.readMeta(spark, path)
      .copy(docCount = -1L, delCount = -1L, countsSeq = -1L))
    val info = Replication.dbsInfo(spark, Seq("s" -> path)).head()
    assert((info.getLong(1), info.getLong(2)) == scanCounts())
    assert(cached()._3, "dbsInfo must self-heal the stale stamp")
  }

  test("shardMap + docShard: counts sum to the corpus, probe matches placement") {
    val dir = java.nio.file.Files.createTempDirectory("repl-shards").toString
    val path = s"$dir/store"
    val leaves = leavesDf((0 until 60).map(i =>
      (s"d$i", 1L, s"h$i", false, Seq.empty[String])))
    Replication.createTarget(spark, path, leaves, cols._1, cols._2,
      cols._3, cols._4, cols._5, numBuckets = 8, seq = 1L)
    val m = Replication.shardMap(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m.values.sum == 60L, s"shard rows must sum to the corpus: $m")
    assert(m.keySet.forall(s => s >= 0 && s < 8))
    // the probe routes to the directory that actually holds the doc
    val withB = spark.read.parquet(s"$path/data")
    (0 until 60 by 13).foreach { i =>
      val want = withB.filter(col("id") === s"d$i")
        .select(col("_b").cast("int")).head().getInt(0)
      assert(Replication.docShard(spark, path, s"d$i") == want,
        s"docShard(d$i) disagrees with placement")
    }
  }
}
