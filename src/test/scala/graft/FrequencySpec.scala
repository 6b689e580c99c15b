package graft

import org.apache.spark.sql.functions._

import graft.operators.Frequency

class FrequencySpec extends SparkSpecBase {

  test("heavy hitters == exact GROUP BY ... HAVING, any partitioning") {
    import spark.implicits._
    // skewed synthetic stream: item i appears ~ n / 2^i times
    val rows = (0 until 12).flatMap { i =>
      Seq.fill(4096 >> i)(s"item_$i")
    } ++ (0 until 3000).map(i => s"rare_$i")
    val k = 20
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("w")
      val got = Frequency.heavyHitters(df, col("w"), k)
        .as[(String, Long)].collect().toSeq
      val n = rows.size
      val want = rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .filter { case (_, c) => c * (k + 1) > n }
        .map { case (w, c) => (w, c) }
        .sortBy { case (w, c) => (-c, w) }
      assert(got == want, s"parts=$parts")
      assert(got.nonEmpty)
    }
  }

  test("candidate set stays bounded at k and counts are exact") {
    import spark.implicits._
    val df = (1 to 10000).map(i => s"u_${i % 50}").toDF("w")
    // uniform data: nothing exceeds n/(k+1) for small k → empty result
    val none = Frequency.heavyHitters(df, col("w"), 10)
    assert(none.count() == 0)
    // k large enough that every value qualifies: all 50, exact counts
    val all = Frequency.heavyHitters(df, col("w"), 100)
      .as[(String, Long)].collect()
    assert(all.length == 50 && all.forall(_._2 == 200L))
  }
}
