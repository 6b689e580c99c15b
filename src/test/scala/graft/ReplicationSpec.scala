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
}
