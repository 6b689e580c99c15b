package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.EventTime

/** The round-6 outage: `events()` hardcoded one parquet physical encoding
  * and every events-reading query threw when the producer upgraded. This
  * spec stages the SAME rows under every encoding a producer realistically
  * emits and asserts [[EventTime]] normalizes all of them to identical
  * `ts_us` values. */
class EventTimeSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft-eventtime").toString

  private def stage(name: String)(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    val normalized = EventTime.withTsUs(base)
      .select($"event_id", $"ts_us", $"user_id", $"event_type", $"value")
    val out = s"$tmpDir/events_$name"
    write(normalized).write.mode("overwrite").parquet(out)
    out
  }

  private def tsUsSet(path: String): Map[Long, Long] = {
    val df = spark.read.parquet(path)
    EventTime.withTsUs(df).select($"event_id", $"ts_us")
      .as[(Long, Long)].collect().toMap
  }

  test("all physical encodings of ts normalize to identical ts_us") {
    // ground truth from the shipped testdata (currently timestamp[us]/NTZ)
    val want = EventTime.withTsUs(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .select($"event_id", $"ts_us").as[(Long, Long)].collect().toMap
    assert(want.nonEmpty)

    // (a) TIMESTAMP_NTZ — timestamp[us], isAdjustedToUTC=false
    val ntz = stage("ntz")(df => df
      .withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType))
      .drop("ts_us"))
    // (b) TIMESTAMP (instant, isAdjustedToUTC=true)
    val tz = stage("tz")(df => df
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us"))
    // (c) raw int64 nanos (what the legacy nanosAsLong path surfaces)
    val nanos = stage("nanos")(df => df
      .withColumn("ts", ($"ts_us" * 1000L).cast(LongType)).drop("ts_us"))
    // (d) raw int64 micros
    val micros = stage("micros")(df => df
      .withColumn("ts", $"ts_us").drop("ts_us"))
    // (e) raw int64 millis
    val millis = stage("millis")(df => df
      .withColumn("ts", ($"ts_us" / 1000L).cast(LongType)).drop("ts_us"))

    assert(spark.read.parquet(ntz).schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(tz).schema("ts").dataType == TimestampType)
    assert(spark.read.parquet(nanos).schema("ts").dataType == LongType)

    assert(tsUsSet(ntz) == want, "TIMESTAMP_NTZ encoding")
    assert(tsUsSet(tz) == want, "TIMESTAMP (UTC instant) encoding")
    assert(tsUsSet(nanos) == want, "int64-nanos encoding")
    assert(tsUsSet(micros) == want, "int64-micros encoding")
    // millis floors away sub-ms precision; compare at ms grain
    val gotMs = tsUsSet(millis)
    assert(gotMs.keySet == want.keySet)
    gotMs.foreach { case (id, us) =>
      assert(us == (want(id) / 1000L) * 1000L, s"event $id millis grain")
    }
  }

  test("ts_us is BIGINT for every encoding") {
    val df = EventTime.withTsUs(spark.read.parquet(s"$sfDir/events.parquet"))
    assert(df.schema("ts_us").dataType == LongType)
  }
}
