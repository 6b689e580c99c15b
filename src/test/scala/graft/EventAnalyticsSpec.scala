package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpecBase {

  private val day = 86400000000L

  private def ev(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("u", "ts", "et")
  }

  private def runFunnel(rows: Seq[(Long, Long, String)],
                        window: Long = 7 * day): Seq[(Int, String, Long)] =
    EventAnalytics.funnel(ev(rows), col("u"), col("ts"), col("et"),
      Seq("a", "b", "c"), window)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq

  test("funnel: ordering is enforced and empty levels report zero") {
    val got = runFunnel(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),   // full conversion
      (2L, 10L, "b"), (2L, 20L, "a"),                   // b BEFORE a: level 1 only
      (3L, 10L, "a"), (3L, 10L, "b")))                  // same instant: not strictly after
    assert(got == Seq((1, "a", 3L), (2, "b", 1L), (3, "c", 1L)))
  }

  test("funnel: the window anchors at the user's FIRST step-1 event") {
    // first 'a' at t=0; a second 'a' at t=5d would put the 8d 'b' in
    // range, but the contract is first-touch anchoring → not converted
    val got = runFunnel(Seq(
      (1L, 0L, "a"), (1L, 5 * day, "a"), (1L, 8 * day, "b")))
    assert(got == Seq((1, "a", 1L), (2, "b", 0L), (3, "c", 0L)))
    // inside the window it counts
    val got2 = runFunnel(Seq((1L, 0L, "a"), (1L, 6 * day, "b")))
    assert(got2 == Seq((1, "a", 1L), (2, "b", 1L), (3, "c", 0L)))
  }

  test("funnel: greedy-earliest chaining still finds later-step events") {
    // b events at 2 and 4; c at 3. Greedy takes b@2, so c@3 qualifies.
    val got = runFunnel(Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 4L, "b"), (1L, 3L, "c")))
    assert(got == Seq((1, "a", 1L), (2, "b", 1L), (3, "c", 1L)))
  }

  test("trending: exact counts, count-desc rank, item tie-break") {
    val rows = Seq(
      (1L, 1L, "b"), (2L, 2L, "b"), (3L, 3L, "a"), (4L, 4L, "a"),
      (5L, 5L, "c"),                                  // win 0: a=2 b=2 c=1
      (6L, day + 1, "c"), (7L, day + 2, "c"), (8L, day + 3, "a"))
    val got = EventAnalytics.trending(ev(rows).withColumnRenamed("u", "x"),
      col("ts"), col("et"), widthHours = 24, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "a", 2L, 1L), (0L, "b", 2L, 2L),   // tie at 2 → 'a' first
      (1L, "c", 2L, 1L), (1L, "a", 1L, 2L)))
  }

  test("retention: cohorts by first day, distinct users per offset") {
    val rows = Seq(
      // u1: cohort day 0, active days 0, 1 (twice), 7
      (1L, 0L, "x"), (1L, day + 5L, "x"), (1L, day + 9L, "x"),
      (1L, 7 * day, "x"),
      // u2: cohort day 0, active day 0 only
      (2L, 100L, "x"),
      // u3: cohort day 1, active days 1 and 2 (offset 1)
      (3L, day, "x"), (3L, 2 * day, "x"))
    val got = EventAnalytics.retention(ev(rows), col("u"), col("ts"),
      Seq(0, 1, 7)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, 0, 2L), (0L, 1, 1L), (0L, 7, 1L),
      (1L, 0, 1L), (1L, 1, 1L)))
  }
}
