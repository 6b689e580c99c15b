package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned event storage — the layout a 100 TB event table
  * needs for time-window queries to read days, not the corpus.
  *
  * Layout: hive-partitioned parquet on `_day = floor(ts_us / 86.4e9)`
  * (UTC day number), rows SORTED by `ts_us` within each written file.
  * Two pruning levels then serve a time-range query:
  *
  *  1. `_day` is a partition column — the day range becomes directory
  *     level partition pruning (`PartitionFilters` in the scan; Spark
  *     never lists, opens, or schedules the other days);
  *  2. within the hit days, the `ts_us` range predicate is pushed to
  *     parquet (`PushedFilters`), and because files are ts-sorted every
  *     row group's min/max is tight — sub-day ranges skip most row
  *     groups of the boundary days.
  *
  * The writer repartitions by `_day` (one shuffle) so each day's data
  * lands in that day's directory as a few large ts-sorted files rather
  * than one fragment per input task — at scale, partition-directory
  * fragmentation (tasks × days tiny files) is what kills event stores;
  * `filesPerDay` caps parallelism-driven fragmentation explicitly. */
object EventStore {

  private val DayUs = 86400000000L

  /** Write `events` (any schema with a `ts` column in any supported
    * physical encoding — normalized via [[EventTime.withTsUs]]) as a
    * time-partitioned store. */
  def write(events: DataFrame, path: String, filesPerDay: Int = 1): Unit = {
    val e = EventTime.withTsUs(events)
      .withColumn("_day", (col("ts_us") / lit(DayUs)).cast("long"))
    e.repartition(col("_day"),
        pmod(xxhash64(col("ts_us")), lit(filesPerDay.toLong)))
      .sortWithinPartitions(col("_day"), col("ts_us"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("_day")
      .parquet(path)
  }

  /** Append a batch into an existing store: new rows land in their
    * `_day` directories as additional ts-sorted files — the append-only
    * fast path an event stream needs (no read-modify-write of existing
    * days). Late-arriving data fragments old days over time; that is
    * [[compact]]'s job, deliberately decoupled so ingestion latency
    * never pays compaction cost. */
  def append(events: DataFrame, path: String, filesPerDay: Int = 1): Unit = {
    val e = EventTime.withTsUs(events)
      .withColumn("_day", (col("ts_us") / lit(DayUs)).cast("long"))
    e.repartition(col("_day"),
        pmod(xxhash64(col("ts_us")), lit(filesPerDay.toLong)))
      .sortWithinPartitions(col("_day"), col("ts_us"))
      .write.mode(SaveMode.Append)
      .partitionBy("_day")
      .parquet(path)
  }

  /** Rewrite ONLY the day directories whose file count exceeds
    * `maxFilesPerDay` (the G7 compaction discipline applied to the
    * event layout): each fragmented day is read, re-sorted by `ts_us`,
    * and swapped as one file set — row-group min/max become tight again
    * and the reader stops paying per-fragment open costs. Untouched
    * days are never read or written. Returns the compacted day ids. */
  def compact(spark: SparkSession, path: String,
              maxFilesPerDay: Int = 4): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.recover(fs, root)
    val days = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_day="))
    val fragmented = days.filter { d =>
      fs.listStatus(d.getPath)
        .count(f => f.getPath.getName.endsWith(".parquet")) > maxFilesPerDay
    }
    fragmented.map { d =>
      val dayDir = d.getPath
      val day = dayDir.getName.stripPrefix("_day=").toLong
      val tmp = new org.apache.hadoop.fs.Path(
        dayDir.getParent, s"_compact_tmp_${dayDir.getName}")
      fs.delete(tmp, true)
      spark.read.parquet(dayDir.toString)
        .sort(col("ts_us"))
        .coalesce(1)
        .write.parquet(tmp.toString)
      // swap by rename; a crash mid-swap is healed by the next
      // maintenance entry's SwapDir.recover
      SwapDir.publish(fs, dayDir, tmp, s"_old_${dayDir.getName}")
      day
    }.toSeq
  }

  /** PURGE — erase every event of the given subjects (`keyCol` values,
    * e.g. user ids) from the store: the GDPR/right-to-be-forgotten
    * pass over an append-only event log. Only `_day` partitions that
    * CONTAIN a subject are rewritten (filtered, re-sorted, swapped by
    * rename — the [[compact]] discipline; a crash mid-swap is healed
    * on the next purge/compact entry by [[SwapDir.recover]];
    * untouched days never read or written). Rows whose key is NULL
    * are never purge victims (a NULL key matches no subject).
    *
    * Honest cost note for 100 TB: an active subject appears in MOST
    * days, so erasure rewrites most of its retention window — that is
    * intrinsic to erasure from a ts-sorted layout, not a plan defect
    * (files sort by ts, so per-file key min/max cannot skip; the
    * LOCATING scan at least reads only the key column). Store
    * layouts that need cheap per-subject erasure bucket by subject
    * instead — and give up the time-pruned reads this store exists
    * for. Idempotent; returns the rewritten day ids. */
  def purge(spark: SparkSession, path: String, keyCol: String,
            keys: Seq[Any]): Seq[Long] = {
    if (keys.isEmpty) return Nil
    purgeDays(spark, path,
      st => st.filter(col(keyCol).isin(keys: _*)),
      day => day.filter(col(keyCol).isNull || !col(keyCol).isin(keys: _*)))
  }

  /** Bulk-erasure purge: the subject set is a RELATION (first column =
    * victim keys), kept distributed end to end — locate by semi join,
    * rewrite by anti join; the victims are never collected to the
    * driver. This is the GDPR-batch shape: millions of subjects stay
    * an executor-side hash relation (AQE broadcasts when small). */
  def purge(spark: SparkSession, path: String, keyCol: String,
            subjects: DataFrame): Seq[Long] = {
    val victims = subjects
      .select(col(subjects.columns.head).as(keyCol)).distinct()
      .persist()
    try purgeDays(spark, path,
      st => st.join(victims, Seq(keyCol), "left_semi"),
      day => day.join(victims, Seq(keyCol), "left_anti"))
    finally victims.unpersist()
  }

  private def purgeDays(spark: SparkSession, path: String,
                        locate: DataFrame => DataFrame,
                        keep: DataFrame => DataFrame): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.recover(fs, root)
    val affected = locate(spark.read.parquet(path))
      .select(col("_day").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    affected.map { day =>
      val dayDir = new org.apache.hadoop.fs.Path(path, s"_day=$day")
      val tmp = new org.apache.hadoop.fs.Path(
        dayDir.getParent, s"_purge_tmp__day=$day")
      fs.delete(tmp, true)
      keep(spark.read.parquet(dayDir.toString))
        .sort(col("ts_us"))
        .coalesce(1)
        .write.parquet(tmp.toString)
      SwapDir.publish(fs, dayDir, tmp, s"_old_purge__day=$day")
      day
    }
  }

  /** Read the store restricted to `[fromUs, toUs)` epoch-micros: the
    * `_day` range prunes partitions, the `ts_us` range prunes row
    * groups. Returns the event columns plus `ts_us` (without `_day`). */
  def readRange(spark: SparkSession, path: String,
                fromUs: Long, toUs: Long): DataFrame = {
    require(fromUs <= toUs, "eventstore: empty range")
    val fromDay = Math.floorDiv(fromUs, DayUs)
    // toUs is exclusive: the day of (toUs - 1) is the last hit day
    val toDay = Math.floorDiv(Math.max(fromUs, toUs - 1), DayUs)
    // Prune at the directory-NAME level BEFORE any leaf-file
    // enumeration: a bare `read.parquet(path)` builds a file index
    // over EVERY day partition's files first and partition-prunes
    // after, so a fixed 2-day window over a year-long store pays the
    // whole table's listing (driver time ∝ table span — measured 6×
    // at a 10× span). One status call lists the day-dir names; the
    // parquet reader then enumerates files only under the hit days.
    graft.view.IndexStore
      .readWhere(spark, path, "_day", d => d >= fromDay && d <= toDay)
      .filter(col("_day") >= fromDay && col("_day") <= toDay &&
        col("ts_us") >= fromUs && col("ts_us") < toUs)
      .drop("_day")
  }
}
