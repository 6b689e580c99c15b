package graft

import org.apache.spark.sql.functions._

import graft.sources.{EventStore, EventTime}

class EventStoreSpec extends SparkSpecBase {

  private val DayUs = 86400000000L

  test("range read == filtered scan, and the plan prunes day partitions") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("evstore").toString
    EventStore.write(events, s"$dir/store")
    val all = EventTime.withTsUs(events)
    val lo = all.agg(min("ts_us")).head().getLong(0)
    val fromUs = lo + 3 * DayUs + DayUs / 2 // mid-day start: row-group path
    val toUs = fromUs + 2 * DayUs
    val got = EventStore.readRange(spark, s"$dir/store", fromUs, toUs)
    val want = all.filter(col("ts_us") >= fromUs && col("ts_us") < toUs)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.select("event_id").except(want.select("event_id")).count() == 0)

    // partition pruning: the scan's partition filters name _day, and the
    // number of selected partitions is the day span, not every day
    val plan = got.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_day"),
      s"no partition filter in:\n$plan")
    val scanned = got.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSeq
    val days = scanned.flatMap(_.split('/').find(_.startsWith("_day="))).distinct
    assert(days.size <= 3, s"read ${days.size} day dirs: $days")
    val totalDays = all.select(((col("ts_us") / DayUs).cast("long")))
      .distinct().count()
    assert(totalDays > 3, "testdata should span more days than the window")
  }

  test("append lands in day dirs; compact rewrites only fragmented days") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("evstore3").toString
    val store = s"$dir/store"
    val first = events.filter(col("event_id") % 2 === 0)
    val late = events.filter(col("event_id") % 2 =!= 0)
    EventStore.write(first, store)
    // three late batches fragment the same days
    (1 to 3).foreach(i =>
      EventStore.append(late.filter(col("event_id") % 3 === i % 3), store))
    val all = EventTime.withTsUs(events)
    val lo = all.agg(min("ts_us")).head().getLong(0)
    val hi = all.agg(max("ts_us")).head().getLong(0)
    assert(EventStore.readRange(spark, store, lo, hi + 1).count() ==
      events.count(), "append lost or duplicated rows")

    def fileSet(day: Long): Set[String] = {
      val d = new java.io.File(s"$store/_day=$day")
      if (!d.exists()) Set()
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val days = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("_day="))
      .map(_.getName.stripPrefix("_day=").toLong).sorted.toSeq
    val before = days.map(d => d -> fileSet(d)).toMap
    val compacted = EventStore.compact(spark, store, maxFilesPerDay = 2)
    assert(compacted.nonEmpty, "fragmented days must compact")
    days.foreach { d =>
      if (compacted.contains(d))
        assert(fileSet(d).size == 1, s"day $d not compacted")
      else
        assert(fileSet(d) == before(d), s"untouched day $d was rewritten")
    }
    // contents unchanged
    assert(EventStore.readRange(spark, store, lo, hi + 1).count() ==
      events.count(), "compaction changed the row set")
  }

  test("empty and boundary ranges behave") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("evstore2").toString
    EventStore.write(events, s"$dir/store")
    val all = EventTime.withTsUs(events)
    val lo = all.agg(min("ts_us")).head().getLong(0)
    val hi = all.agg(max("ts_us")).head().getLong(0)
    assert(EventStore.readRange(spark, s"$dir/store", lo, lo).count() == 0)
    assert(EventStore.readRange(spark, s"$dir/store", lo, hi + 1).count() ==
      all.count())
  }

  test("purge erases a subject's events day-locally; untouched days byte-identical") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("evpurge").toString
    val store = s"$dir/store"
    EventStore.write(events, store)
    val all = EventTime.withTsUs(events)
    // one subject confined to FEW days, so some days stay untouched:
    // pick the user with the narrowest day span
    val spans = all.groupBy(col("user_id"))
      .agg(countDistinct((col("ts_us") / DayUs).cast("long")).as("d"))
      .orderBy(col("d"), col("user_id")).head()
    val victim = spans.getLong(0)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stamp(): Map[String, Seq[(String, Long)]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(store))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_day="))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).filter(_.isFile)
            .map(f => (f.getPath.getName, f.getModificationTime)).toSeq
            .sortBy(_._1)).toMap
    val before = stamp()
    val rewritten = EventStore.purge(spark, store, "user_id", Seq(victim))
    val after = stamp()
    val hi = all.agg(max("ts_us")).head().getLong(0)
    val lo = all.agg(min("ts_us")).head().getLong(0)
    val got = EventStore.readRange(spark, store, lo, hi + 1)
    assert(got.filter(col("user_id") === victim).count() == 0)
    assert(got.count() ==
      all.filter(col("user_id") =!= victim).count())
    val touched = rewritten.map(d => s"_day=$d").toSet
    assert(touched.nonEmpty && touched.size < before.size,
      s"the narrow-span victim should leave some of ${before.size} days untouched")
    for ((d, files) <- before if !touched.contains(d))
      assert(after(d) == files, s"untouched day $d must not be rewritten")
    // idempotent
    assert(EventStore.purge(spark, store, "user_id", Seq(victim)).isEmpty)
  }

  test("purge(DataFrame) == purge(Seq); null-keyed rows survive both paths") {
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    // null out some keys: purge must never treat NULL as a victim
    val events = base.withColumn("user_id",
      when(col("event_id") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("user_id")))
    val nNull = events.filter(col("user_id").isNull).count()
    assert(nNull > 0)
    val dir = java.nio.file.Files.createTempDirectory("evpurgedf").toString
    val (sa, sb) = (s"$dir/a", s"$dir/b")
    EventStore.write(events, sa)
    EventStore.write(events, sb)
    val victims = events.select(col("user_id"))
      .filter(col("user_id").isNotNull && col("user_id") % 5 === 0)
      .distinct()
    val victimSeq: Seq[Any] = victims.collect().map(_.getLong(0)).toSeq
    val daysA = EventStore.purge(spark, sa, "user_id", victimSeq)
    // the DataFrame overload gets a victim set WITH a null row — the
    // null must select nothing and erase nothing
    val daysB = EventStore.purge(spark, sb, "user_id",
      victims.unionByName(victims.limit(1)
        .select(lit(null).cast("long").as("user_id"))))
    assert(daysA == daysB)
    val all = EventTime.withTsUs(events)
    val lo = all.agg(min("ts_us")).head().getLong(0)
    val hi = all.agg(max("ts_us")).head().getLong(0)
    val ga = EventStore.readRange(spark, sa, lo, hi + 1)
    val gb = EventStore.readRange(spark, sb, lo, hi + 1)
    assert(ga.count() == gb.count())
    assert(ga.select("event_id").except(gb.select("event_id")).count() == 0)
    assert(ga.filter(col("user_id").isNull).count() == nNull,
      "null-keyed rows must survive purge")
    assert(ga.count() == all.filter(col("user_id").isNull ||
      !(col("user_id") % 5 === 0)).count())
  }

  test("a crash between the swap renames heals on the next maintenance entry") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("evcrash").toString
    val store = s"$dir/store"
    EventStore.write(events, store)
    val all = EventTime.withTsUs(events)
    val total = all.count()
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val days = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_day="))
      .map(_.getPath).sortBy(_.getName)
    // simulate a purge that crashed BETWEEN the two renames: the day
    // exists only under the _old_purge__ name, plus tmp debris from a
    // second crashed attempt
    val crashed = days.head
    assert(fs.rename(crashed,
      new org.apache.hadoop.fs.Path(store, "_old_purge_" + crashed.getName)))
    fs.mkdirs(new org.apache.hadoop.fs.Path(store,
      "_purge_tmp_" + days.last.getName))
    // and one that crashed AFTER publish, before cleanup: stale old
    // copy beside a live day — must be deleted, not restored
    val published = days(1)
    val staleOld = new org.apache.hadoop.fs.Path(store,
      s"_old_${published.getName}")
    org.apache.hadoop.fs.FileUtil.copy(fs, published, fs, staleOld,
      false, spark.sparkContext.hadoopConfiguration)
    // any maintenance entry recovers: compact with a threshold no day
    // exceeds does nothing EXCEPT the recovery
    assert(EventStore.compact(spark, store, maxFilesPerDay = 1000).isEmpty)
    assert(fs.exists(crashed), "crashed day must be restored")
    assert(!fs.exists(staleOld), "superseded old copy must be deleted")
    val lo = all.agg(min("ts_us")).head().getLong(0)
    val hi = all.agg(max("ts_us")).head().getLong(0)
    assert(EventStore.readRange(spark, store, lo, hi + 1).count() == total,
      "no row may be lost across the crash + recovery")
  }
}
