package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) detection at corpus scale.
  *
  * The 100 TB formulation is the classic TWO-PASS sketch-then-verify:
  *
  *  1. a mergeable Misra-Gries summary (Misra & Gries 1982; mergeability
  *     per Agarwal et al., "Mergeable Summaries", PODS'12) runs as ONE
  *     partial-aggregate pass — each task keeps at most `k` counters, the
  *     partials merge associatively, and the result is a ≤`k`-item
  *     CANDIDATE set guaranteed to contain every item with true frequency
  *     > N/(k+1); the sketch never shuffles rows, only k-entry buffers;
  *  2. the candidates (bounded driver metadata, ≤ k entries) come back as
  *     ONE `isin` filter for an exact count pass, and items failing the
  *     exact threshold `cnt·(k+1) > N` are dropped.
  *
  * The output is therefore EXACT — the same rows as `GROUP BY item HAVING
  * cnt·(k+1) > N` — while the expensive full-cardinality shuffle of a
  * naive global GROUP BY is replaced by a k-bounded sketch plus a
  * candidates-only aggregation (at 100 TB: billions of distinct items
  * reduced to k counters per task).
  */
object Frequency {

  /** Misra-Gries summary of at most `k` counters over strings. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Seq[(String, Long)], Seq[(String, Long)]] {

    override def zero: Seq[(String, Long)] = Nil

    override def reduce(b: Seq[(String, Long)], v: String): Seq[(String, Long)] = {
      val i = b.indexWhere(_._1 == v)
      if (i >= 0) b.updated(i, (v, b(i)._2 + 1L))
      else if (b.size < k) b :+ (v, 1L)
      // decrement-all: drop one "vote" from every counter, keep positives
      else b.map { case (s, c) => (s, c - 1L) }.filter(_._2 > 0L)
    }

    override def merge(a: Seq[(String, Long)],
                       b: Seq[(String, Long)]): Seq[(String, Long)] = {
      val summed = (a ++ b).groupBy(_._1)
        .map { case (s, cs) => (s, cs.map(_._2).sum) }.toSeq
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count from everything (the
        // mergeable-summaries rule), keeping the top-k positives
        val cut = summed.map(_._2).sorted(Ordering[Long].reverse)(k)
        summed.map { case (s, c) => (s, c - cut) }.filter(_._2 > 0L)
      }
    }

    override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = r
    override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  }

  /** Exact heavy hitters of `item` (a string column of `df`): all items
    * with frequency strictly greater than N/(k+1), with their exact
    * counts — `(item, cnt)`, ordered by (cnt desc, item) for stable
    * output. Two jobs: the sketch pass and the verify pass (plus the
    * `N` lookup folded into the sketch pass). */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    require(k > 0, "heavyHitters: k must be positive")
    val items = df.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val mg = udaf(new MisraGries(k))
    // one pass: the MG candidate buffer and the exact N together
    val row = items.agg(mg(col("item")).as("cand"), count(lit(1)).as("n"))
      .head()
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val n = row.getLong(1)
    if (cands.isEmpty)
      return items.groupBy("item").agg(count(lit(1)).as("cnt")).limit(0)
    items.filter(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > lit(n))
      .orderBy(col("cnt").desc, col("item"))
  }
}
