package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.view.{PartitionedStore, QueryOpts, Reduce, View}

class PartitionedViewSpec extends SparkSpecBase {
  import spark.implicits._

  // Partitioned doc corpus over orders: partition = customer bucket
  // ("c<custkey%10>"), doc key = the order — the CouchDB partitioned-id
  // shape "<partition>:<key>".
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val docs = orders.select(
    concat(lit("c"), (col("o_custkey") % 10).cast("string"),
      lit(":o"), col("o_orderkey").cast("string")).as("_id"),
    col("o_orderkey"), col("o_custkey"),
    col("o_orderdate").cast("string").as("o_orderdate"),
    col("o_totalprice"))

  private def mkView(d: org.apache.spark.sql.DataFrame = docs) =
    View(d, col("_id"), col("o_orderdate"), col("o_totalprice"))

  private def tmp(): String =
    Files.createTempDirectory("graft-pview").toString + "/idx"

  test("partitionScope == global query filtered to the partition") {
    val scoped = mkView().partitionScope("c3")
      .query(QueryOpts(reduce = false)).collect()
    val global = mkView().query(QueryOpts(reduce = false)).collect()
      .filter(_.getString(0).startsWith("c3:"))
    assert(scoped.nonEmpty)
    assert(scoped.map(_.toString).toSeq == global.map(_.toString).toSeq)
    // totalRows reports the SCOPED count (the partition envelope)
    assert(mkView().partitionScope("c3").totalRows == scoped.length)
  }

  test("partitionScope reduce aggregates partition-locally") {
    val v = View(docs, col("_id"), col("o_orderdate"), lit(1L),
      Some(Reduce.Sum))
    val got = v.partitionScope("c7").query(QueryOpts(group = true))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = docs.filter(col("_id").startsWith("c7:"))
      .groupBy(col("o_orderdate")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp && got.nonEmpty)
  }

  test("partitioned index: scoped serving is identical and prunes to one _p dir") {
    val path = tmp()
    mkView().materializePartitioned(path, numTasks = 4, seq = 7L)
    val idx = mkView().fromPartitionedIndex(spark, path, "c5")
    assert(idx.updateSeq.contains(7L))
    val opts = QueryOpts(reduce = false,
      startKey = Some("1995-01-01"), endKey = Some("1996-12-31"))
    val got = idx.query(opts)
    val want = mkView().partitionScope("c5").query(opts).collect()
    assert(got.collect().map(_.toString).toSeq ==
      want.map(_.toString).toSeq && want.nonEmpty)
    // directory-level pruning: every file read lives under _p=c5
    val plan = got.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_p"),
      s"no _p partition filter in:\n$plan")
    // input_file_name is only meaningful at the scan (pre-exchange):
    // probe the same pruned read the scoped view is built on
    val dirs = PartitionedStore.open(spark, path)
      .filter(col("_p") === "c5").select(input_file_name()).distinct()
      .collect()
      .flatMap(_.getString(0).split('/').find(_.startsWith("_p="))).distinct
    assert(dirs.toSeq == Seq("_p=c5"), s"read partitions: ${dirs.toSeq}")
  }

  test("partitioned reduce paging: pages concatenate exactly; _p pruned each page") {
    val path = tmp()
    val rv = View(docs, col("_id"), col("o_orderdate"), lit(1L),
      Some(Reduce.Sum))
    rv.materializePartitioned(path, numTasks = 4, seq = 3L)
    val pv = rv.fromPartitionedIndex(spark, path, "c5")
    val unpaged = pv.query(QueryOpts(group = true)).collect()
      .map(_.toString).toSeq
    assert(unpaged.size > 5, "fixture must span several pages")
    // walk 3-group pages; the stitched walk must be the unpaged
    // reduce, order included
    var token: Option[String] = None
    var walked = Seq.empty[String]
    var pages = 0
    var more = true
    while (more) {
      val r = pv.queryPage(QueryOpts(group = true), pageSize = 3,
        resume = token)
      walked = walked ++ r.rows.collect().map(_.toString)
      token = r.nextToken; more = token.isDefined; pages += 1
    }
    assert(pages >= 3, s"expected a real multi-page walk, got $pages")
    assert(walked == unpaged,
      "paged partitioned reduce must stitch to the unpaged read")
    // cursoring re-aggregates only groups PAST the cursor: page 2 of
    // the walk equals the unpaged tail sliced the same way
    assert(walked.drop(3).take(3) == unpaged.drop(3).take(3))
    // the EXACT cursored query page 2 issues (group page, limit,
    // resume strictly after page 1's last group key) must still carry
    // the _p partition filter — asserted on the cursored plan itself,
    // not on a fresh unpaged query
    val page1LastKey = pv.query(QueryOpts(group = true,
      limit = Some(3L))).collect().last.getString(0)
    val cursored = pv.query(QueryOpts(group = true, limit = Some(3L),
      resumeAfter = Some((graft.gfunctions
        .collation_key_lit(page1LastKey), 0L))))
    val plan = cursored.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_p"),
      s"cursored page lost the _p partition filter:\n$plan")
    assert(cursored.collect().map(_.toString).toSeq ==
      walked.drop(3).take(3),
      "the cursored query must BE page 2")
  }

  test("invalid partitioned ids fail the build; bad scope keys rejected") {
    val bad = Seq("nocolon", "_sys:doc", ":doc", "p:").toDF("_id")
      .select(col("_id"), lit("k").as("k"), lit(1L).as("v"))
    val v = View(bad, col("_id"), col("k"), col("v"))
    val e = intercept[Exception] {
      v.materializePartitioned(tmp(), numTasks = 2)
    }
    assert(e.getMessage != null)
    Seq("", "_local", "a:b").foreach { p =>
      intercept[IllegalArgumentException](mkView().partitionScope(p))
    }
  }

  test("updatePartitionedIndex == rebuild; only changed partitions rewritten") {
    val path = tmp()
    mkView().materializePartitioned(path, numTasks = 4, seq = 1L)
    val untouchedBefore = PartitionedStore.open(spark, path)
      .filter(col("_p") === "c1").select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet

    // change: every c4 order re-priced; delete one c4 doc
    val c4 = docs.filter(col("_id").startsWith("c4:"))
    val victim = c4.select(col("_id")).orderBy(col("_id")).head().getString(0)
    val changed = c4.filter(col("_id") =!= victim)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mkView().updatePartitionedIndex(spark, path, changed,
      deletedIds = Seq(victim), newSeq = 2L)

    // maintained == rebuilt from the post-change corpus
    val postDocs = docs.filter(!col("_id").startsWith("c4:"))
      .unionByName(changed)
    val rebuilt = tmp()
    mkView(postDocs).materializePartitioned(rebuilt, numTasks = 4, seq = 2L)
    def dump(p: String) = PartitionedStore.open(spark, p)
      .select(col("_id"), col("key"), col("value")).collect()
      .map(_.toString).sorted.toSeq
    assert(dump(path) == dump(rebuilt))
    assert(graft.view.IndexStore.readMeta(spark, path).updateSeq == 2L)

    // partition-locality: c1's files were not rewritten
    val untouchedAfter = PartitionedStore.open(spark, path)
      .filter(col("_p") === "c1").select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(untouchedAfter == untouchedBefore)
  }

  test("merge swap handles partition keys needing path escaping") {
    val path = tmp()
    val d0 = Seq(("a b:1", "k1", 1L), ("a b:2", "k2", 2L), ("q:1", "k1", 3L))
      .toDF("_id", "k", "v")
    val v0 = View(d0, col("_id"), col("k"), col("v"))
    v0.materializePartitioned(path, numTasks = 2, seq = 1L)
    val changed = Seq(("a b:2", "k9", 9L)).toDF("_id", "k", "v")
    v0.updatePartitionedIndex(spark, path, changed, newSeq = 2L)
    val got = View(d0, col("_id"), col("k"), col("v"))
      .fromPartitionedIndex(spark, path, "a b")
      .query(QueryOpts(reduce = false)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a b:1", "k1", 1L), ("a b:2", "k9", 9L)))
  }

  test("partitionStats reports per-partition doc and row counts") {
    val path = tmp()
    mkView().materializePartitioned(path, numTasks = 4)
    val stats = PartitionedStore.partitionStats(spark, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = docs.groupBy(PartitionedStore.partitionOf(col("_id")))
      .agg(count(lit(1)), countDistinct(col("_id"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats == exp && stats.size == 10)
  }

  test("partitionStats reads only the partition and id columns") {
    val storePath = tmp()
    mkView().materializePartitioned(storePath, numTasks = 4, seq = 1L)
    val q = graft.view.PartitionedStore.partitionStats(spark, storePath)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val schemaRe = """ReadSchema: struct<([^>]*)>""".r
    val read = schemaRe.findFirstMatchIn(plan).map(_.group(1)).getOrElse("?")
    assert(read == "_id:string",
      s"partition stats must scan only _id (+_p partition col), read: $read")
  }
}
