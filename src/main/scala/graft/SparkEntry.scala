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
    "q11_collation_mixed" -> (q11 _)
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
        |) ORDER BY pos""".stripMargin
  )
}
