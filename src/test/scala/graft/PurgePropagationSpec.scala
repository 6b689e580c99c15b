package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Replication, Revisions, Similarity, TextSearch}
import graft.view.{IndexStore, View}

/** Purge propagation (`purge_seq`) — the store logs effective purges,
  * secondary indexes catch up bucket-locally, and a purge of unknown
  * ids is a complete no-op. */
class PurgePropagationSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkStore(dir: String): String = {
    val store = s"$dir/store"
    // ids 1..40: every doc has rev 1-h<i>; ids %5==0 carry two
    // conflict branches 2-a<i> (winner by hash? a<b so b wins) and
    // 2-b<i> on top of rev 1
    val base = (1L to 40L).map(i => (i, 1L, s"h$i", false, Seq.empty[String]))
      .toDF("id", "rev_pos", "rev_hash", "deleted", "ancestors")
      .filter(col("id") % 5 =!= 0)
    val confl = (1L to 40L).filter(_ % 5 == 0).flatMap { i =>
      Seq((i, 2L, s"a$i", false, Seq(s"1-h$i")),
          (i, 2L, s"b$i", false, Seq(s"1-h$i")))
    }.toDF("id", "rev_pos", "rev_hash", "deleted", "ancestors")
    Replication.createTarget(spark, store, base.unionByName(confl),
      col("id"), col("rev_pos"), col("rev_hash"), col("deleted"),
      col("ancestors"), numBuckets = 8, seq = 5L)
    store
  }

  private def fsOf(p: String) = IndexStore.fsFor(spark, p)

  private def stamp(dir: String, part: String): Map[String, Seq[(String, Long, Long)]] = {
    val fs = fsOf(dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(part + "="))
      .map(d => d.getPath.getName ->
        fs.listStatus(d.getPath).filter(_.isFile)
          .map(f => (f.getPath.getName, f.getModificationTime, f.getLen))
          .toSeq.sortBy(_._1)).toMap
  }

  // winners of the store, live only: (id, win_rev)
  private def liveWinners(store: String): DataFrame =
    Revisions.summary(Replication.openTarget(spark, store), col("id"),
        col("rev_pos"), col("rev_hash"), col("deleted"))
      .filter(!col("win_deleted"))
      .select(col("id"), col("win_rev"))

  test("purge of only-unknown ids is a complete no-op: no rewrite, no seq bump, no log") {
    val dir = java.nio.file.Files.createTempDirectory("prg").toString
    val store = mkStore(dir)
    val before = stamp(s"$store/data", "_b")
    val m0 = IndexStore.readMeta(spark, store)
    val req = Seq((777L, 1L, "nope"), (888L, 2L, "nada"))
      .toDF("id", "rev_pos", "rev_hash")
    val bs = Replication.purgeTarget(spark, store, req, col("id"),
      col("rev_pos"), col("rev_hash"))
    assert(bs.isEmpty, "unknown-id purge must rewrite nothing")
    val m1 = IndexStore.readMeta(spark, store)
    assert(m1.updateSeq == m0.updateSeq && m1.purgeSeq == m0.purgeSeq,
      "unknown-id purge must bump neither sequence")
    assert(stamp(s"$store/data", "_b") == before,
      "unknown-id purge must leave every bucket byte-identical")
    assert(!fsOf(store).exists(new org.apache.hadoop.fs.Path(s"$store/purges")),
      "unknown-id purge must log nothing")
  }

  test("pendingPurges splits gone vs alive; re-read past the cursor is empty") {
    val dir = java.nio.file.Files.createTempDirectory("prg").toString
    val store = mkStore(dir)
    // full purge of doc 7 (all leaves), branch purge of doc 10 (2-b10
    // only — 1-h10 resurrects under the a-branch? no: 2-a10 survives,
    // doc stays alive)
    val req = Seq((7L, 1L, "h7"), (10L, 2L, "b10"))
      .toDF("id", "rev_pos", "rev_hash")
    Replication.purgeTarget(spark, store, req, col("id"),
      col("rev_pos"), col("rev_hash"))
    val p = Replication.pendingPurges(spark, store, 0L)
    assert(p.purgeSeq == 1L)
    assert(p.goneIds.map(_.asInstanceOf[Long]).sorted == Seq(7L))
    assert(p.aliveIds.map(_.asInstanceOf[Long]).sorted == Seq(10L))
    val done = Replication.pendingPurges(spark, store, p.purgeSeq)
    assert(done.goneIds.isEmpty && done.aliveIds.isEmpty)
    // a second purge batch stacks: only the new ids pend past seq 1
    Replication.purgeTarget(spark, store,
      Seq((9L, 1L, "h9")).toDF("id", "rev_pos", "rev_hash"),
      col("id"), col("rev_pos"), col("rev_hash"))
    val p2 = Replication.pendingPurges(spark, store, p.purgeSeq)
    assert(p2.purgeSeq == 2L &&
      p2.goneIds.map(_.asInstanceOf[Long]) == Seq(9L) &&
      p2.aliveIds.isEmpty)
  }

  test("view catch-up: retire + winner re-map, no rebuild, seqs right, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("prg").toString
    val store = mkStore(dir)
    val vx = s"$dir/vx"
    def view(docs: DataFrame) = View(docs, col("id"), col("id"),
      col("win_rev"))
    view(liveWinners(store)).materialize(vx, numBuckets = 4, seq = 5L)
    // doc 3 fully purged (gone); doc 10's b-branch purged (alive,
    // winner flips from 2-b10 to 2-a10: b > a by hash)
    Replication.purgeTarget(spark, store,
      Seq((3L, 1L, "h3"), (10L, 2L, "b10"))
        .toDF("id", "rev_pos", "rev_hash"),
      col("id"), col("rev_pos"), col("rev_hash"))
    val beforeData = stamp(s"$vx/data", "_kb")
    val m0 = IndexStore.readMeta(spark, vx)
    val pq = view(liveWinners(store)).catchUpPurges(spark, vx, store,
      liveWinners(store))
    val m1 = IndexStore.readMeta(spark, vx)
    assert(pq == IndexStore.readMeta(spark, store).purgeSeq &&
      m1.purgeSeq == pq, "index purge_seq must land on the store's")
    assert(m1.updateSeq == m0.updateSeq,
      "a purge is not a change: update_seq preserved")
    // served rows == the view mapped fresh over the post-purge winners
    val got = view(liveWinners(store)).fromIndex(spark, vx).query()
      .select(col("key").cast("long").as("id"), col("value").as("win_rev"))
    val want = liveWinners(store)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    assert(got.filter(col("id") === 3L).count() == 0)
    assert(got.filter(col("id") === 10L).head().getString(1) == "2-a10")
    // untouched key buckets byte-identical (the purged ids hit a strict
    // subset of the 4 buckets)
    val afterData = stamp(s"$vx/data", "_kb")
    val touched = beforeData.keySet.filter(k =>
      beforeData(k) != afterData.getOrElse(k, Nil))
    assert(touched.size < beforeData.size,
      s"catch-up must not rewrite every bucket (touched $touched)")
    // idempotent: a re-run sees no pending purges and rewrites nothing
    val again = view(liveWinners(store)).catchUpPurges(spark, vx, store,
      liveWinners(store))
    assert(again == pq && stamp(s"$vx/data", "_kb") == afterData)
  }

  test("text catch-up == fresh rebuild over the purged corpus (stats included)") {
    val dir = java.nio.file.Files.createTempDirectory("prg").toString
    val store = mkStore(dir)
    val docsAll = (1L to 40L).map(i =>
        (i, s"alpha doc$i ${if (i % 2 == 0) "beta" else "gamma"} tail"))
      .toDF("id", "text")
    def liveDocs: DataFrame =
      docsAll.join(liveWinners(store).select(col("id")), Seq("id"),
        "left_semi")
    val tx = s"$dir/tx"
    TextSearch.buildTextIndex(liveDocs, col("id"), col("text"), tx,
      nBuckets = 8, seq = 5L)
    Replication.purgeTarget(spark, store,
      Seq((4L, 1L, "h4"), (11L, 1L, "h11"), (10L, 2L, "b10"))
        .toDF("id", "rev_pos", "rev_hash"),
      col("id"), col("rev_pos"), col("rev_hash"))
    val pq = TextSearch.catchUpPurges(spark, tx, store, liveDocs,
      col("id"), col("text"))
    assert(pq == 1L &&
      IndexStore.readMeta(spark, tx).purgeSeq == 1L &&
      IndexStore.readMeta(spark, tx).updateSeq == 5L)
    val fresh = s"$dir/fresh"
    TextSearch.buildTextIndex(liveDocs, col("id"), col("text"), fresh,
      nBuckets = 8, seq = 5L)
    val a = TextSearch.searchIndexed(spark, tx, Seq("alpha", "beta"), 40)
    val b = TextSearch.searchIndexed(spark, fresh, Seq("alpha", "beta"), 40)
    assert(a.collect().toSeq == b.collect().toSeq,
      "caught-up scores must be bit-identical to a fresh rebuild")
    assert(a.filter(col("doc_id").isin(4L, 11L)).count() == 0)
    val stA = spark.read.parquet(s"$tx/stats").select("n", "sum_dl").head()
    val stB = spark.read.parquet(s"$fresh/stats").select("n", "sum_dl").head()
    assert(stA == stB, s"stats drifted: $stA vs $stB")
  }

  test("ANN catch-up retires gone vectors bucket-locally; alive vectors stay") {
    val dir = java.nio.file.Files.createTempDirectory("prg").toString
    val store = mkStore(dir)
    val rnd = new scala.util.Random(7)
    val emb = (1L to 40L).map(i =>
        (i, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val ax = s"$dir/ax"
    Similarity.buildIvfSq8Index(emb, ax, nCentroids = 4, idBuckets = 8,
      seq = 5L)
    Replication.purgeTarget(spark, store,
      Seq((8L, 1L, "h8"), (10L, 2L, "b10"))
        .toDF("id", "rev_pos", "rev_hash"),
      col("id"), col("rev_pos"), col("rev_hash"))
    val pq = Similarity.catchUpAnnPurges(spark, ax, store)
    assert(pq == 1L && IndexStore.readMeta(spark, ax).purgeSeq == 1L)
    val ids = spark.read.parquet(s"$ax/data").select(col("_id"))
      .as[Long].collect().toSet
    assert(!ids.contains(8L), "fully-purged vector must leave the index")
    assert(ids.contains(10L), "alive (branch-purged) doc keeps its vector")
    assert(ids.size == 39)
    // idempotent
    assert(Similarity.catchUpAnnPurges(spark, ax, store) == 1L)
  }
}
