package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's `_stats` as a typed Dataset `Aggregator` — the
  * type-safe formulation of a custom reduce. Distributes exactly like
  * the builtin (partial buffers merged associatively; no driver-side
  * rereduce), and registers as a UDAF for SQL/`Reduce.Custom` use:
  *
  * {{{
  * val stats = udaf(StatsAggregator)
  * View(docs, id, key, value, Some(Reduce.Custom(v => stats(v).as("value"))))
  * }}}
  */
case class StatsBuffer(sum: Double, count: Long, min: Double, max: Double,
                       sumsqr: Double)

object StatsAggregator extends Aggregator[Double, StatsBuffer, StatsBuffer] {

  override def zero: StatsBuffer =
    StatsBuffer(0.0, 0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0)

  override def reduce(b: StatsBuffer, v: Double): StatsBuffer =
    StatsBuffer(b.sum + v, b.count + 1, math.min(b.min, v),
      math.max(b.max, v), b.sumsqr + v * v)

  override def merge(a: StatsBuffer, b: StatsBuffer): StatsBuffer =
    StatsBuffer(a.sum + b.sum, a.count + b.count, math.min(a.min, b.min),
      math.max(a.max, b.max), a.sumsqr + b.sumsqr)

  override def finish(r: StatsBuffer): StatsBuffer = r

  override def bufferEncoder: Encoder[StatsBuffer] = Encoders.product
  override def outputEncoder: Encoder[StatsBuffer] = Encoders.product
}
