package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive event-time ingestion.
  *
  * Different producers hand us the same logical "timestamp" column under
  * different parquet physical encodings — pyarrow/pandas upgrades alone have
  * shipped this repo int64-nanos (legacy), TIMESTAMP(isAdjustedToUTC=false)
  * = `timestamp[us]` read as TIMESTAMP_NTZ, and plain int64 epoch values.
  * A pipeline that hardcodes one encoding falls over the day a producer
  * upgrades; instead we inspect the LOADED Spark dtype and normalize to
  * epoch **microseconds** (`ts_us`, BIGINT) — the same value DuckDB's
  * `epoch_us(ts)` yields, so oracle SQL stays encoding-agnostic.
  *
  * - `TimestampType` → `unix_micros` directly (instant semantics).
  * - `TimestampNTZType` → cast to instant under the session timezone; all
  *   graft entrypoints pin `spark.sql.session.timeZone=UTC`, so the naive
  *   wall-clock is read as UTC — exactly DuckDB's `epoch_us` convention.
  * - `LongType` (raw int64, or int64-nanos surfaced by
  *   `spark.sql.legacy.parquet.nanosAsLong`) → the unit is inferred from
  *   magnitude: one sampled row picks seconds/millis/micros/nanos by which
  *   unit puts the instant inside [1970, ~2200]. Epoch units are 3 orders
  *   of magnitude apart, so the ranges cannot overlap for any plausible
  *   event time. One `limit(1)` job (a single row-group read) at load time
  *   — O(1), never a table scan.
  *
  * Nanos→micros uses `div 1000` (floor for the non-negative epochs real
  * event data carries), matching DuckDB's truncation.
  */
object EventTime {

  /** Column of epoch micros derived from `tsCol`, whatever its loaded
    * dtype. For LongType the unit probe runs one tiny Spark job. */
  def tsUsColumn(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampType =>
        unix_micros(col(tsCol))
      case TimestampNTZType =>
        // session tz is UTC in every graft entrypoint → NTZ wall-clock
        // is interpreted as UTC, the epoch_us convention
        unix_micros(col(tsCol).cast(TimestampType))
      case LongType =>
        val sample = df.select(abs(col(tsCol)).as("a"))
          .filter(col("a").isNotNull).limit(1).collect()
        val a = sample.headOption.map(_.getLong(0)).getOrElse(0L)
        val c2200s = 7_300_000_000L
        if (a < c2200s) col(tsCol) * lit(1_000_000L) // seconds
        else if (a < c2200s * 1000L) col(tsCol) * lit(1000L) // millis
        else if (a < c2200s * 1000_000L) col(tsCol) // micros
        else expr(s"$tsCol div 1000") // nanos (floor division)
      case other =>
        throw new IllegalArgumentException(
          s"EventTime: unsupported dtype $other for column $tsCol — " +
            "expected TIMESTAMP, TIMESTAMP_NTZ, or int64 epoch")
    }

  /** `df` plus `out` = epoch-micros BIGINT normalization of `tsCol`. */
  def withTsUs(df: DataFrame, tsCol: String = "ts",
               out: String = "ts_us"): DataFrame =
    df.withColumn(out, tsUsColumn(df, tsCol).cast(LongType))
}
