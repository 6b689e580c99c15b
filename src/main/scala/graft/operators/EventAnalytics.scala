package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream — funnel conversion
  * and cohort retention. Both are formulated as chains of PARTIAL-
  * AGGREGABLE min/distinct aggregations on the user key: no per-user
  * event collection, no window over a user's whole history — per-user
  * state in every stage is one timestamp, so a power user with millions
  * of events costs the same as anyone else (the 100 TB skew case).
  */
object EventAnalytics {

  /** Ordered-funnel conversion counts.
    *
    * Contract (first-touch anchoring, the common product-analytics
    * default): a user reaches step `i` when there is a chain
    * `t1 < t2 < ... < ti` with `t1` = the user's EARLIEST `steps(0)`
    * event and every later step inside `(t_{i-1}, t1 + windowMicros]`,
    * each `t_i` chosen greedily earliest (greedy is optimal given the
    * fixed anchor: taking the earliest qualifying event can only widen
    * what remains reachable).
    *
    * Plan shape: one filtered `min` aggregation per step — `n` shuffles
    * on the user key for an `n`-step funnel, each carrying ONE row per
    * surviving user; the per-level counts fold into a single final
    * aggregation job (the loop builds plan, not jobs).
    *
    * Returns `(step_idx, step, users)`, `step_idx` 1-based, one row per
    * step (0-user levels included). */
  def funnel(events: DataFrame, user: Column, tsMicros: Column,
             eventType: Column, steps: Seq[String],
             windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    require(windowMicros > 0, "funnel: window must be positive")
    val ev = events.select(user.as("_u"), tsMicros.cast("long").as("_ts"),
      eventType.cast("string").as("_et"))
    // (u, anchor, tprev): anchor = first step-1 event, tprev = the
    // greedy-earliest event of the latest step reached
    var cur = ev.filter(col("_et") === steps.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("_anchor"))
      .withColumn("_tprev", col("_anchor"))
    val levels = Seq.newBuilder[DataFrame]
    levels += cur.select(lit(1).as("step_idx"),
      lit(steps.head).as("step"), col("_u"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      cur = ev.filter(col("_et") === st)
        .join(cur, "_u")
        .filter(col("_ts") > col("_tprev") &&
          col("_ts") <= col("_anchor") + windowMicros)
        // _anchor is functionally dependent on _u; grouping on both
        // keeps it without a rejoin
        .groupBy(col("_u"), col("_anchor"))
        .agg(min(col("_ts")).as("_tprev"))
      levels += cur.select(lit(i + 1).as("step_idx"),
        lit(st).as("step"), col("_u"))
    }
    val all = levels.result().reduce(_ unionByName _)
    // left-join counts onto the step list so empty levels still show
    val ss = events.sparkSession
    import ss.implicits._
    val stepList = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step_idx", "step")
    stepList.join(
        all.groupBy(col("step_idx")).agg(count(lit(1)).as("users")),
        Seq("step_idx"), "left")
      .select(col("step_idx"), col("step"),
        coalesce(col("users"), lit(0L)).as("users"))
      .orderBy(col("step_idx"))
  }

  /** Trending items per tumbling window: the top-`k` most frequent
    * `item` values in each `widthHours` window, ranked by count with a
    * deterministic item tie-break. Two stages, both partial-aggregable:
    * exact (window, item) counts — the only pass over the raw events —
    * then a rank over the tiny counts relation (windows × distinct
    * items, already thousands of times smaller than the input). Returns
    * `(win, item, cnt, rank)`, `win` in width units since epoch. */
  def trending(events: DataFrame, tsMicros: Column, item: Column,
               widthHours: Int, k: Int): DataFrame = {
    require(widthHours > 0 && k > 0, "trending: width and k positive")
    val width = widthHours * 3600L * 1000000L
    val counts = events
      .select(item.cast("string").as("item"), tsMicros.cast("long").as("_ts"))
      .select(col("item"), expr(s"_ts div $width").as("win"))
      .groupBy(col("win"), col("item")).agg(count(lit(1)).as("cnt"))
    Relational.topKPerGroup(counts, Seq(col("win")),
      Seq(col("cnt").desc, col("item").asc), k)
      .select(col("win"), col("item"), col("cnt"), col("rank"))
      .orderBy(col("win"), col("rank"))
  }

  /** Cohort retention: users grouped by the day of their FIRST event
    * (the cohort), counted again on each requested day offset.
    *
    * Two aggregations: per-user first day (one row per user), then a
    * distinct-(user, day) activity relation joined to the cohort map and
    * rolled up — per-user state is one long throughout.
    *
    * Returns `(cohort_day, day_offset, users)` for every requested
    * offset (offset 0 = cohort size), days as epoch days from
    * `tsMicros`. */
  def retention(events: DataFrame, user: Column, tsMicros: Column,
                offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ >= 0),
      "retention: offsets must be non-negative")
    val dayUs = 86400000000L
    // exact integer division (a float quotient could mis-bucket an
    // event landing within rounding distance of midnight)
    val ev = events.select(user.as("_u"), tsMicros.cast("long").as("_tsl"))
      .select(col("_u"), expr(s"_tsl div $dayUs").as("_day"))
    val cohorts = ev.groupBy(col("_u")).agg(min(col("_day")).as("cohort_day"))
    val active = ev.distinct()
    active.join(cohorts, "_u")
      .withColumn("day_offset", (col("_day") - col("cohort_day")).cast("int"))
      .filter(col("day_offset").isin(offsets: _*))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
