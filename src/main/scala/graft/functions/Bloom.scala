package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter join pruning — the explicit form of the
  * runtime filter every warehouse engine injects for selective joins:
  * build a compact bit set from the SMALL side's join keys, prefilter
  * the BIG side with it BEFORE the join, then run the exact join on the
  * survivors. False positives only cost prefilter leakage (the exact
  * join removes them); false negatives cannot happen, so the joined
  * relation is IDENTICAL to the un-prefiltered join — that identity is
  * the oracle gate, the saved shuffle is the point.
  *
  * Representation: the filter is a literal `Seq[Boolean]` embedded in
  * the plan as ONE array literal (constant-folded, broadcast with the
  * plan — the centroid-literal discipline), probed with `k`
  * `element_at(bits, pmod(xxhash64(key, seed), m) + 1)` lookups — all
  * codegen'd primitives, no UDF, no variable-shift gymnastics. Size it
  * by the small side: `mBits/8` bytes of plan literal (default 2^17
  * bits = 16 KiB); with `k = 2` and n keys the false-positive rate is
  * `(1 - e^(-2n/m))^2` (~4% at n = m/8). At 100 TB the prefilter drops
  * most of the fact-table scan's output before the join's exchange —
  * rows that would shuffle only to be discarded. */
object Bloom {

  private def bitIdx(key: Column, seed: Int, mBits: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(mBits.toLong))

  /** Build the bit set from the small side's keys. Driver memory and
    * the collected set are bounded by `mBits` (the distinct bit
    * indexes), NOT by the key count — the bounded-metadata contract
    * every literal-plane construction here follows. */
  def buildBits(small: DataFrame, key: Column, mBits: Int = 1 << 17,
                k: Int = 2): Seq[Boolean] = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0,
      "bloom: mBits must be a power of two")
    require(k >= 1 && k <= 8, "bloom: k in 1..8")
    val idx = small.select(explode(array(
      (0 until k).map(i => bitIdx(key, i, mBits)): _*)).as("i"))
      .distinct().collect().map(_.getLong(0))
    val bits = new Array[Boolean](mBits)
    idx.foreach(i => bits(i.toInt) = true)
    bits.toSeq
  }

  /** The membership predicate: true iff every probe bit is set (maybe
    * present); false guarantees absent. */
  def mightContain(key: Column, bits: Seq[Boolean], k: Int = 2): Column = {
    val arr = typedLit(bits)
    (0 until k).map { i =>
      element_at(arr, (bitIdx(key, i, bits.size) + 1).cast("int"))
    }.reduce(_ && _)
  }

  /** LEFT SEMI join with the big side Bloom-prefiltered: identical
    * rows to `big.join(small, cond, "left_semi")`, minus most of the
    * non-matching fact rows' trip through the join exchange. Builds the
    * filter from `small` (one aggregation job), embeds it, joins
    * exactly. */
  def semiJoinPruned(big: DataFrame, bigKey: Column, small: DataFrame,
                     smallKey: Column, mBits: Int = 1 << 17,
                     k: Int = 2): DataFrame = {
    val bits = buildBits(small, smallKey, mBits, k)
    // materialize both join keys under fresh names BEFORE the join: with
    // `small` derived from `big` (a self semi join) the raw key column
    // would be ambiguous between the two lineages
    big.filter(mightContain(bigKey, bits, k))
      .withColumn("_bloom_bk", bigKey)
      .join(small.select(smallKey.as("_bloom_k")).distinct(),
        col("_bloom_bk") === col("_bloom_k"), "left_semi")
      .drop("_bloom_bk")
  }
}
