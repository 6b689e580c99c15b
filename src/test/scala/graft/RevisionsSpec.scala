package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Revisions

class RevisionsSpec extends SparkSpecBase {

  private def leaves(rows: Seq[(String, Long, String, Boolean)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "rev_pos", "rev_hash", "deleted")
  }

  private def summarize(rows: Seq[(String, Long, String, Boolean)]) =
    Revisions.summary(leaves(rows), col("id"), col("rev_pos"),
      col("rev_hash"), col("deleted"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getString(4)))
      .toSeq

  test("a live leaf beats a DEEPER deleted leaf") {
    val got = summarize(Seq(
      ("a", 5L, "ffff", true), ("a", 2L, "aaaa", false)))
    assert(got == Seq(("a", "2-aaaa", false, 0L, "")))
  }

  test("among live leaves: deepest wins, depth ties break to greatest hash") {
    val got = summarize(Seq(
      ("b", 3L, "aa", false), ("b", 3L, "cc", false), ("b", 2L, "zz", false)))
    assert(got == Seq(("b", "3-cc", false, 2L, "2-zz,3-aa")))
  }

  test("all leaves deleted: doc resolves deleted, same (pos, hash) rule") {
    val got = summarize(Seq(
      ("c", 1L, "aa", true), ("c", 4L, "bb", true), ("c", 4L, "aa", true)))
    assert(got == Seq(("c", "4-bb", true, 0L, "")))
  }

  test("winners/conflicts relations agree with the summary") {
    val rows = Seq(
      ("a", 5L, "ffff", true), ("a", 2L, "aaaa", false),
      ("b", 3L, "aa", false), ("b", 3L, "cc", false), ("b", 2L, "zz", false),
      ("c", 1L, "aa", true))
    val df = leaves(rows)
    val w = Revisions.winners(df, col("id"), col("rev_pos"),
      col("rev_hash"), col("deleted")).orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(w.toSeq == Seq(
      ("a", 2L, "aaaa", false), ("b", 3L, "cc", false), ("c", 1L, "aa", true)))
    val cf = Revisions.conflicts(df, col("id"), col("rev_pos"),
      col("rev_hash"), col("deleted")).orderBy("id", "rev_pos", "rev_hash")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(cf.toSeq == Seq(("b", 2L, "zz"), ("b", 3L, "aa")))
  }

  test("resolution is partitioning-invariant (partial-aggregable)") {
    import spark.implicits._
    val rows = (0 until 200).flatMap { i =>
      val id = s"d$i"
      Seq((id, 1L + i % 4, f"h$i%03d-m", i % 7 == 0)) ++
        (if (i % 3 == 0) Seq((id, 1L + (i / 3) % 4, f"h$i%03d-c", i % 6 == 0))
         else Nil)
    }
    val one = summarize(rows)
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts)
        .toDF("id", "rev_pos", "rev_hash", "deleted")
      val got = Revisions.summary(df, col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted")).orderBy(col("id")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getString(4))).toSeq
      assert(got == one, s"parts=$parts")
    }
  }

  private def replica(rows: Seq[(String, Long, String, Boolean, Seq[String])])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("id", "rev_pos", "rev_hash", "deleted", "ancestors")
  }

  private def merge(a: Seq[(String, Long, String, Boolean, Seq[String])],
                    b: Seq[(String, Long, String, Boolean, Seq[String])]) =
    Revisions.mergeReplicas(replica(a), replica(b), col("id"),
      col("rev_pos"), col("rev_hash"), col("deleted"), col("ancestors"))
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getString(4))).toSeq

  test("mergeReplicas prunes a tip the other replica extended — no fake conflict") {
    // A holds 2-bb; B extended that same branch to 3-cc
    val a = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    val b = Seq(("d", 3L, "cc", false, Seq("2-bb", "1-aa")))
    assert(merge(a, b) == Seq(("d", "3-cc", false, 0L, "")))
    // and the merge converges: both replicas compute the same state
    assert(merge(b, a) == merge(a, b))
  }

  test("mergeReplicas surfaces genuine divergence as a conflict") {
    // both extended rev 1 independently — neither is the other's ancestor
    val a = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    val b = Seq(("d", 2L, "zz", false, Seq("1-aa")))
    // winner = greater hash at equal depth; loser is the conflict
    assert(merge(a, b) == Seq(("d", "2-zz", false, 1L, "2-bb")))
    assert(merge(b, a) == merge(a, b))
  }

  test("mergeReplicas: shared revs collapse; deleted branch loses; all-deleted resolves deleted") {
    val a = Seq(
      ("s", 1L, "aa", false, Seq.empty[String]),   // shared, unchanged
      ("x", 2L, "bb", false, Seq("1-aa")),
      ("t", 2L, "dd", true, Seq("1-cc")))
    val b = Seq(
      ("s", 1L, "aa", false, Seq.empty[String]),
      ("x", 2L, "ee", true, Seq("1-aa")),          // deleted divergent branch
      ("t", 2L, "dd", true, Seq("1-cc")))          // both deleted the doc
    assert(merge(a, b) == Seq(
      ("s", "1-aa", false, 0L, ""),
      ("t", "2-dd", true, 0L, ""),
      // live 2-bb beats the DELETED deeper-hash 2-ee; a deleted loser
      // is not a conflict
      ("x", "2-bb", false, 0L, "")))
  }

  private def purged(ls: Seq[(String, Long, String, Boolean, Seq[String])],
                     rq: Seq[(String, Long, String)]) = {
    import spark.implicits._
    Revisions.purge(replica(ls), col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"),
        rq.toDF("id", "rev_pos", "rev_hash"),
        col("id"), col("rev_pos"), col("rev_hash"))
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getString(4))).toSeq
  }

  test("purge resurrects the parent; a covered branch folds instead") {
    // d1: lone branch — purging the tip resurrects 2-bb (live)
    // d2: two branches over the same rev 1 — purging one tip folds it
    //     into the other branch; rev 1 stays interior
    val ls = Seq(
      ("d1", 3L, "cc", true, Seq("2-bb", "1-aa")),
      ("d2", 2L, "mm", false, Seq("1-kk")),
      ("d2", 2L, "zz", false, Seq("1-kk")))
    val got = purged(ls, Seq(("d1", 3L, "cc"), ("d2", 2L, "zz")))
    assert(got == Seq(
      ("d1", "2-bb", false, 0L, ""),
      ("d2", "2-mm", false, 0L, "")))
  }

  test("purge removes fully-purged docs entirely; delete keeps them") {
    val ls = Seq(
      ("gone", 1L, "aa", false, Seq.empty[String]),
      ("dead", 2L, "dd", true, Seq("1-cc")), // deleted, NOT purged
      ("live", 1L, "ee", false, Seq.empty[String]))
    val got = purged(ls, Seq(("gone", 1L, "aa")))
    // "gone" vanishes; "dead" still resolves (deleted); "live" intact
    assert(got == Seq(
      ("dead", "2-dd", true, 0L, ""),
      ("live", "1-ee", false, 0L, "")))
  }

  test("purge ignores requests that do not name a current leaf") {
    val ls = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    // 1-aa is interior; 9-xx does not exist — both no-ops
    val got = purged(ls, Seq(("d", 1L, "aa"), ("d", 9L, "xx")))
    assert(got == Seq(("d", "2-bb", false, 0L, "")))
  }
}
