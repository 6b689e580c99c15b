package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-dimensional data skipping
  * for parquet scans (the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`; Morton 1966).
  *
  * A table laid out sorted by ONE column prunes row groups only for
  * predicates on that column; a range query on any other dimension reads
  * everything. Interleaving the bits of two quantized dimensions into one
  * sort key makes file/row-group boundaries follow squares of the (x, y)
  * plane, so min/max statistics stay tight on BOTH columns and a 2-D box
  * query skips most of the layout — no index, just write order.
  *
  * Everything here is pure codegen'd integer arithmetic (shift/and/or
  * folds — no UDF), and the writer is one `repartitionByRange` shuffle on
  * the z-value: at 100 TB, clustering cost is the same single pass a
  * plain sort-write pays, and the benefit compounds on every later scan.
  */
object ZOrder {

  /** Linear quantization of `c` into `[0, 2^bits)` using exact integer
    * arithmetic: `(clamp(c, lo, hi) - lo) · (2^bits - 1) div (hi - lo)`.
    * Monotone, endpoints map to 0 and 2^bits-1. */
  def quantize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, "zorder: empty quantization range")
    require(bits > 0 && bits <= 31, "zorder: bits in 1..31")
    val maxq = (1L << bits) - 1
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi)) - lit(lo)
    // integer div (a float quotient could break the bit pattern)
    (clamped * maxq - pmod(clamped * maxq, lit(hi - lo)))
      .divide(lit(hi - lo)).cast("long")
  }

  /** The Morton interleave of two already-quantized coordinates (each in
    * `[0, 2^bits)`): bit `i` of `x` lands at position `2i`, bit `i` of
    * `y` at `2i+1`. A fold of `2·bits` shift/and/or terms — constant
    * codegen, no loop at runtime. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "zorder: bits in 1..31")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` clustered on the z-value of `(x, y)` (raw columns,
    * quantized with the given bounds): one range shuffle into
    * `numFiles` z-contiguous, z-sorted files. The z column itself is
    * derivable, so it is not stored. */
  def writeClustered(df: DataFrame, path: String, x: Column, y: Column,
                     xRange: (Long, Long), yRange: (Long, Long),
                     bits: Int, numFiles: Int): Unit = {
    val z = zvalue(quantize(x, xRange._1, xRange._2, bits),
      quantize(y, yRange._1, yRange._2, bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** The ANSI/DuckDB SQL expression equal to `zvalue(qx, qy, bits)` over
    * already-quantized integer expressions — used by oracle replays so
    * the interleave arithmetic itself is gated, not just the filtered
    * rows. */
  def zvalueSqlQ(qx: String, qy: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($qx >> $i) & 1) << ${2 * i}) + ((($qy >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
