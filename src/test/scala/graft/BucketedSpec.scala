package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketed

class BucketedSpec extends SparkSpecBase {
  import spark.implicits._

  test("equi-join of co-bucketed tables plans without a shuffle exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt LOCATION '/tmp/graft-bkt-wh'")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so bucket co-location (not broadcasting)
    // is what eliminates the shuffle — the fact-fact case at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      Bucketed.write(orders, "bkt.orders_b", "o_orderkey", 4)
      Bucketed.write(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt.lineitem_b", "o_orderkey", 4)

      val joined = Bucketed.read(spark, "bkt.orders_b")
        .join(Bucketed.read(spark, "bkt.lineitem_b"), Seq("o_orderkey"))
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))

      val expected = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey"))
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == expected)
      // the payoff: no shuffle anywhere in join+agg on the bucket key
      assert(Bucketed.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")
    }
  }
}
