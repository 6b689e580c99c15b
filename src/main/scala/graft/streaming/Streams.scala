package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gfunctions.collation_key

/** Structured Streaming formulations of the engine's operators: the
  * reference's change-feed-driven incremental view maintenance,
  * continuous windowed aggregation, and streaming dedup — all standard
  * `readStream → transform → writeStream` plans with watermarks, so the
  * same code runs against Kafka/files at scale. */
object Streams {

  /** Tumbling-window event counts with a watermark: late data beyond
    * `lateness` is dropped and state is bounded — the streaming
    * equivalent of [[graft.operators.Relational.tumblingAgg]]. Expects a
    * `ts` TimestampType column. */
  def windowedCounts(events: DataFrame, width: String = "1 hour",
                     lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Streaming `_stats` reduce: the reference's stats builtin maintained
    * continuously per window+key with bounded state. */
  def windowedStats(events: DataFrame, width: String = "1 hour",
                    lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        sum(col("value")).as("sum"),
        count(col("value")).as("count"),
        min(col("value")).as("min"),
        max(col("value")).as("max"),
        sum(col("value") * col("value")).as("sumsqr"))

  /** Streaming exact dedup on a content key with bounded state: documents
    * whose fingerprint was already seen inside the watermark horizon are
    * dropped — the streaming form of [[graft.operators.Dedup.exactGroups]].
    */
  def dedupStream(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Incremental view-index maintenance — the reference's design-doc view
    * updater driven by the change feed, as a streaming upsert: each
    * micro-batch's docs are mapped through the view's emit columns and
    * merged into the parquet index (delete-then-append per `_id`, the
    * same merge `View.updateIndex` does in batch).
    *
    * `emit` maps a batch of docs to view rows `(_id, key, value)`.
    * Returns the started query; the index at `path` stays sorted by
    * collation key per batch so range queries keep pruning. */
  def maintainViewIndex(spark: SparkSession, changeFeed: DataFrame,
                        emit: DataFrame => DataFrame, path: String,
                        checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changeFeed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = emit(batch)
          .withColumn("_ck", collation_key(col("key")))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val p = new org.apache.hadoop.fs.Path(path)
        val merged =
          if (fs.exists(p)) {
            val ids = rows.select(col("_id")).distinct()
            spark.read.parquet(path)
              .join(ids, Seq("_id"), "left_anti")
              .unionByName(rows)
          } else rows
        val tmp = path + "._tmp"
        merged
          .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
            col("_ck"))
          .sortWithinPartitions(col("_ck"))
          .write.mode("overwrite").parquet(tmp)
        fs.delete(p, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
        ()
      }
      .start()
}
