package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded distributed top-k: keep the `k` best (score, id) pairs,
  * ordered by score DESC then id ASC (the window-rank tie-break).
  *
  * The scale rationale: a `row_number().over(Window.partitionBy(g))`
  * top-k shuffles EVERY candidate row of a group to one partition
  * before ranking. This aggregate participates in partial aggregation —
  * each map task keeps at most k pairs per group — so the shuffle
  * carries `partitions × k` rows per group instead of all of them
  * (n/k-fold less traffic for brute-force ANN at corpus scale). The
  * per-row cost is an O(k) bounded insert in an object buffer
  * (ObjectHashAggregate, not codegen) — the trade is decisively won
  * once the group is larger than a few × k.
  *
  * Score comparison uses java.lang.Double.compare (total order, NaN
  * greatest) — the same ordering Spark's sort applies to DoubleType.
  */
class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1) // score DESC
    c < 0 || (c == 0 && a._2 < b._2)             // id ASC on ties
  }

  private def top(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortWith(lt).take(k)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)],
                      a: (Double, Long)): Seq[(Double, Long)] =
    // bounded insert: never grows past k+1 before truncation
    if (b.length >= k && lt(b.last, a)) b else top(b :+ a)

  override def merge(x: Seq[(Double, Long)],
                     y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    top(x ++ y)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    top(b)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
