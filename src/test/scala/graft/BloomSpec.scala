package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom

class BloomSpec extends SparkSpecBase {

  test("no false negatives; substantial rejection of non-members") {
    import spark.implicits._
    val keys = (0L until 2000L).map(_ * 7L).toDF("k")
    val bits = Bloom.buildBits(keys, col("k"), mBits = 1 << 16, k = 2)
    // every member passes
    assert(keys.filter(!Bloom.mightContain(col("k"), bits, 2))
      .count() == 0, "a member was rejected — false negative")
    // most non-members (disjoint key space) are rejected
    val probes = (0L until 2000L).map(_ * 7L + 3L).toDF("k")
    val leaked = probes.filter(Bloom.mightContain(col("k"), bits, 2)).count()
    assert(leaked < 400, s"fp leakage too high: $leaked/2000")
  }

  test("semiJoinPruned == plain left semi, any partitioning; prefilter prunes") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val big = (0 until 30000).map(_ => rnd.nextInt(5000).toLong)
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "k")
    val small = (0L until 5000L).filter(_ % 13 == 0).toDF("k")
    val got = Bloom.semiJoinPruned(big, col("k"), small, col("k"))
    val want = big.join(small.select(col("k")).distinct(), Seq("k"),
      "left_semi")
    assert(got.select("row_id").except(want.select("row_id")).count() == 0)
    assert(want.select("row_id").except(got.select("row_id")).count() == 0)
    assert(got.count() == want.count())
    // the prefilter alone drops most non-matching rows before the join
    val bits = Bloom.buildBits(small, col("k"))
    val pre = big.filter(Bloom.mightContain(col("k"), bits)).count()
    assert(pre < big.count() && pre >= want.count(),
      s"prefilter $pre of ${big.count()} (exact ${want.count()})")
  }

  test("string keys work through the same hash path") {
    import spark.implicits._
    val small = Seq("alpha", "beta", "gamma").toDF("s")
    val big = (Seq("alpha", "beta", "gamma", "delta", "epsilon") ++
      (1 to 100).map(i => s"junk$i")).toDF("s")
    val got = Bloom.semiJoinPruned(big, col("s"), small, col("s"))
      .select("s").as[String].collect().sorted.toSeq
    assert(got == Seq("alpha", "beta", "gamma"))
  }
}
