package graft

import org.apache.spark.sql.functions._

import graft.functions.StatsAggregator
import graft.view.{QueryOpts, Reduce, View}

class StatsAggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("typed Aggregator as custom reduce equals the builtin _stats") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val stats = udaf(StatsAggregator)

    val viaTyped = View(orders, $"o_orderkey", $"o_orderstatus",
      $"o_totalprice", Some(Reduce.Custom(v => stats(v).as("value"))))
      .query(QueryOpts(group = true)).collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap

    val viaBuiltin = View(orders, $"o_orderkey", $"o_orderstatus",
      $"o_totalprice", Some(Reduce.Stats))
      .query(QueryOpts(group = true)).collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap

    assert(viaTyped.keySet == viaBuiltin.keySet)
    viaTyped.foreach { case (k, t) =>
      val b = viaBuiltin(k)
      assert(t.getLong(1) == b.getLong(1))                     // count
      assert(t.getDouble(2) == b.getDouble(2))                 // min
      assert(t.getDouble(3) == b.getDouble(3))                 // max
      assert(math.abs(t.getDouble(0) - b.getDouble(0)) < 1e-6) // sum
    }
  }

  test("typed Dataset path: groupByKey + the Aggregator's TypedColumn") {
    val prices = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderstatus", $"o_totalprice").as[(String, Double)]
    val r = prices.groupByKey(_._1)
      .mapValues(_._2)
      .agg(StatsAggregator.toColumn)
      .collect().toMap
    assert(r.keySet == Set("F", "O", "P"))
    r.values.foreach(s => assert(s.count > 0 && s.min <= s.max))
  }
}
