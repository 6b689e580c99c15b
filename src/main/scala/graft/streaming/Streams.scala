package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gfunctions.collation_key

/** A closed user session emitted by [[Streams.sessionizeStream]]. */
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                            n_events: Long)

/** Per-key state carried between micro-batches by the sessionizer. */
final case class SessionState(start_us: Long, last_us: Long, n: Long)

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

  /** Continuous gap sessionization with custom state —
    * `flatMapGroupsWithState` over a `KeyValueGroupedDataset`: one state
    * record per user carries (session start, last seen, count); a session
    * closes and is EMITTED when the gap to the next event exceeds
    * `gapSeconds`, or when the EVENT-TIME timeout fires (the watermark
    * passed last-seen + gap, so no on-time event can extend it) — state
    * is bounded by active users. Event-time timeouts, not processing
    * time: processing-time timeouts self-trigger endless empty
    * micro-batches. The streaming form of
    * [[graft.operators.Relational.sessionize]]. Expects columns
    * `user_id: long`, `ts: timestamp`. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long,
                       lateness: String = "0 seconds")
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events.withWatermark("ts", lateness)
      .selectExpr("user_id", "ts").as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start_us, s.last_us, s.n))
          } else {
            val sorted = rows.map(_._2.getTime * 1000L).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { ts =>
              cur match {
                case Some(s) if ts - s.last_us <= gapUs =>
                  cur = Some(SessionState(s.start_us, ts, s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start_us, s.last_us, s.n)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_us / 1000L + gapSeconds * 1000L)
            }
            closed.reverseIterator
          }
      }
  }

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
