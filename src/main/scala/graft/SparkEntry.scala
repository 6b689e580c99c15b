package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.view.{MaxKey, QueryOpts, Reduce, View}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each query key maps to. */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table stores nanosecond timestamps, which Spark's parquet
    * reader rejects by default; read them as raw long nanos and expose
    * `ts_us` (micros, floor) — the same value DuckDB's `epoch_us(ts)`
    * produces. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_emit_sum")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- A. views

  /** A1/A3: emit(l_returnflag, l_quantity), reduce=_sum, group=true. */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    View(li, col("l_orderkey"), col("l_returnflag"),
      col("l_quantity").cast("decimal(18,2)"), Some(Reduce.Sum))
      .query(QueryOpts(group = true))
      // exact decimal sum, emitted as double: deterministic in both engines
      .select(col("key").as("l_returnflag"),
        col("value").cast("double").as("sum_qty"))
  }

  /** A2: emit(o_orderpriority), reduce=_count, group=true. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"), col("o_orderpriority"),
      lit(1), Some(Reduce.Count))
      .query(QueryOpts(group = true))
      .select(col("key").as("o_orderpriority"), col("value").as("cnt"))

  /** A4: builtin _stats reduce, flattened. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)"), Some(Reduce.Stats))
      .query(QueryOpts(group = true))
      .select(col("key").as("o_orderstatus"),
        col("value.sum").cast("double").as("sum_v"),
        col("value.count").as("count_v"),
        col("value.min").cast("double").as("min_v"),
        col("value.max").cast("double").as("max_v"),
        col("value.sumsqr").cast("double").as("sumsqr_v"))

  /** A5: custom reduce (max) distributes like the builtins. */
  private def q04(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"), Some(Reduce.Custom(v => max(v).as("value"))))
      .query(QueryOpts(group = true))
      .select(col("key").as("o_orderstatus"), col("value").as("max_price"))

  /** A6: [year, month] array keys rolled up at group_level=1. */
  private def q05(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"),
      array(year(col("o_orderdate")).cast("double"),
        month(col("o_orderdate")).cast("double")),
      lit(1L), Some(Reduce.Count))
      .query(QueryOpts(groupLevel = Some(1)))
      .select(element_at(col("key"), 1).as("yr"), col("value").as("cnt"))

  /** A7/A8: reduce=false rows in collation order, startkey/endkey range
    * (exclusive end), via binary range predicates on the collation key. */
  private def q06(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"),
      col("o_orderdate"), col("o_totalprice"))
      .query(QueryOpts(
        startKey = Some(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
        endKey = Some(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")),
        inclusiveEnd = false, reduce = false))
      .select(col("id").as("o_orderkey"),
        (year(col("key")) * 10000 + month(col("key")) * 100 +
          dayofmonth(col("key"))).cast("long").as("o_date"),
        col("value").as("o_totalprice"))

  /** A9: keys= multi-key lookup. */
  private def q07(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"), col("o_orderpriority"), lit(1))
      .query(QueryOpts(keys = Some(Seq("1-URGENT", "5-LOW")), reduce = false))
      .select(col("id").as("o_orderkey"), col("key").as("o_orderpriority"))

  /** A10: descending + limit + skip. */
  private def q08(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "orders"), col("o_orderkey"), col("o_totalprice"), lit(1))
      .query(QueryOpts(descending = true, limit = Some(100), skip = 10,
        reduce = false))
      .select(col("id").as("o_orderkey"), col("key").as("o_totalprice"))

  /** A11: include_docs joins the source document onto each view row. */
  private def q09(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "customer"), col("c_custkey"), col("c_mktsegment"), lit(1))
      .query(QueryOpts(reduce = false, includeDocs = true))
      .select(col("id").as("c_custkey"), col("key").as("c_mktsegment"),
        col("doc.c_name").as("c_name"), col("doc.c_acctbal").as("c_acctbal"))

  /** A12: linked documents — emit value {_id: …}; include_docs resolves the
    * LINKED doc (here: another customer) instead of the emitting one. */
  private def q10(s: SparkSession, dir: String): DataFrame =
    View(t(s, dir, "customer"), col("c_custkey"), col("c_name"),
      struct((col("c_custkey") % 150 + 1).as("_id")))
      .query(QueryOpts(reduce = false, includeDocs = true))
      .select(col("id").as("c_custkey"), col("key").as("c_name"),
        col("doc.c_custkey").as("linked_custkey"),
        col("doc.c_name").as("linked_name"))

  /** A13: mixed-type keys from two views unioned: every number key sorts
    * before every string key, numbers numerically, strings bytewise —
    * the collation byte encoding makes one binary sort implement it. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val va = View(o.filter(col("o_orderstatus") === "F"), col("o_orderkey"),
      col("o_orderkey").cast("double"), lit(1))
    val vb = View(o.filter(col("o_orderstatus") === "O"), col("o_orderkey"),
      col("o_orderpriority"), lit(1))
    val unioned = va.rows.select(col("_id"), col("_ck"))
      .unionByName(vb.rows.select(col("_id"), col("_ck")))
    unioned
      .withColumn("pos",
        row_number().over(Window.orderBy(col("_ck"), col("_id"))).cast("long"))
      .select(col("pos"), col("_id").as("o_orderkey"))
  }

  // ------------------------------------------------------ B. relational ops

  import graft.operators.Relational

  /** B1: star join — facts shuffle once, all dims broadcast. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
    val na = t(s, dir, "nation"); val re = t(s, dir, "region")
    li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .orderBy(col("r_name"))
  }

  /** B2: top-3 orders per priority. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    Relational.topKPerGroup(t(s, dir, "orders"),
      Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rank"))

  /** B3: tumbling 1h windows over the events stream table. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    Relational.tumblingAgg(events(s, dir), col("ts_us"), 1, col("value"))
      .orderBy(col("bucket"))

  /** B4: gap sessionization (30 min) → sessions per user. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    Relational.sessionize(events(s, dir), col("user_id"), col("ts_us"),
      1800L * 1000000L)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("sessions"))
      .orderBy(col("user_id"))

  /** B5: as-of join — for each purchase, the latest signup at-or-before it
    * (per user), via union+window (no inequality join). */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Relational.asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "signup"),
      "user_id", col("ts_us"), Seq("event_id"))
      .select(col("event_id"), col("asof_ts")).orderBy(col("event_id"))
  }

  /** B6: range join — clicks within 1h after each signup, per signup. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Relational.rangeJoinCount(
      ev.filter(col("event_type") === "signup"),
      ev.filter(col("event_type") === "click"),
      "user_id", col("ts_us"), "event_id", 3600L * 1000000L)
      .orderBy(col("event_id"))
  }

  /** B7: exact interpolated percentiles per group. */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Relational.percentiles(t(s, dir, "orders"), col("o_orderstatus"),
      col("o_totalprice"), Seq("p50" -> 0.5, "p90" -> 0.9))
      .orderBy(col("o_orderstatus"))

  /** B8: pivot with a fixed value list (static schema — no driver scan). */
  private def q19(s: SparkSession, dir: String): DataFrame =
    Relational.pivotCount(t(s, dir, "orders"), "o_orderstatus",
      "o_orderpriority",
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .orderBy(col("o_orderstatus"))

  /** B9: equi-width histogram. */
  private def q20(s: SparkSession, dir: String): DataFrame =
    Relational.histogram(t(s, dir, "orders"), col("o_totalprice"), 50000.0)
      .orderBy(col("bucket"))

  // --------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_emit_sum" -> (q01 _),
    "q02_count_group" -> (q02 _),
    "q03_stats" -> (q03 _),
    "q04_custom_reduce" -> (q04 _),
    "q05_group_level" -> (q05 _),
    "q06_range_rows" -> (q06 _),
    "q07_keys_lookup" -> (q07 _),
    "q08_desc_limit_skip" -> (q08 _),
    "q09_include_docs" -> (q09 _),
    "q10_linked_docs" -> (q10 _),
    "q11_collation_mixed" -> (q11 _),
    "q12_star_join" -> (q12 _),
    "q13_topk_group" -> (q13 _),
    "q14_tumbling" -> (q14 _),
    "q15_sessionize" -> (q15 _),
    "q16_asof" -> (q16 _),
    "q17_range_join" -> (q17 _),
    "q18_percentiles" -> (q18 _),
    "q19_pivot" -> (q19 _),
    "q20_histogram" -> (q20 _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_emit_sum" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q02_count_group" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q03_stats" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  COUNT(*) AS count_v,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_v,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sumsqr_v
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q04_custom_reduce" ->
      """SELECT o_orderstatus, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q05_group_level" ->
      """SELECT CAST(YEAR(o_orderdate) AS DOUBLE) AS yr, COUNT(*) AS cnt
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q06_range_rows" ->
      """SELECT o_orderkey,
        |  YEAR(o_orderdate) * 10000 + MONTH(o_orderdate) * 100 + DAY(o_orderdate) AS o_date,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_orderdate, o_orderkey""".stripMargin,
    "q07_keys_lookup" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q08_desc_limit_skip" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 100 OFFSET 10""".stripMargin,
    "q09_include_docs" ->
      """SELECT c_custkey, c_mktsegment, c_name, c_acctbal FROM customer
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q10_linked_docs" ->
      """SELECT c.c_custkey, c.c_name AS c_name, l.c_custkey AS linked_custkey,
        |       l.c_name AS linked_name
        |FROM customer c LEFT JOIN customer l ON l.c_custkey = c.c_custkey % 150 + 1
        |ORDER BY c.c_name, c.c_custkey""".stripMargin,
    "q11_collation_mixed" ->
      """SELECT ROW_NUMBER() OVER (ORDER BY t, p, o_orderkey) AS pos, o_orderkey
        |FROM (
        |  SELECT 0 AS t, '' AS p, o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 1 AS t, o_orderpriority AS p, o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |) ORDER BY pos""".stripMargin,
    "q12_star_join" ->
      """SELECT r_name, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q13_topk_group" ->
      """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q14_tumbling" ->
      """SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q15_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
        |      OR LAG(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS sessions
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q16_asof" ->
      """SELECT l.event_id, epoch_us(r.ts) AS asof_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q17_range_join" ->
      """SELECT s.event_id, COUNT(*) AS cnt
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = s.user_id
        |  AND epoch_us(c.ts) >= epoch_us(s.ts)
        |  AND epoch_us(c.ts) < epoch_us(s.ts) + 3600000000
        |GROUP BY s.event_id ORDER BY s.event_id""".stripMargin,
    "q18_percentiles" ->
      """SELECT o_orderstatus,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q19_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_1_URGENT,
        |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_2_HIGH,
        |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_3_MEDIUM,
        |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_4_NOT_SPECIFIED,
        |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_5_LOW
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q20_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
