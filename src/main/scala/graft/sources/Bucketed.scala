package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed, sorted table storage: the co-location primitive for 100 TB
  * fact-fact joins. Writing both sides bucketed by the join key with the
  * same bucket count makes every subsequent equi-join and aggregation on
  * that key **exchange-free** — the shuffle is paid once at write time,
  * amortized over every query that follows (the multi-query analog of
  * the view engine's materialized index).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table. `buckets` should be
    * sized so each bucket's data fits an executor's working memory at
    * the target scale (buckets = tables' join parallelism forever after).
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains no SHUFFLE exchange —
    * the property bucketing buys (a broadcast exchange moves only the
    * small side and is fine). Exposed for tests/diagnostics. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    !p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning")
  }
}
