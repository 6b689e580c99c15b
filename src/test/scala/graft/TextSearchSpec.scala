package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.TextSearch

class TextSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private val terms = Seq("hash", "join", "stream")

  test("bm25: monotone in tf, discounted by doc length") {
    val tiny = Seq(
      (1L, "hash hash hash join"), // high tf, short
      (2L, "hash join"),           // low tf, short
      (3L, "hash " + ("filler " * 50) + "join"), // low tf, long
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val s = TextSearch.bm25Scores(tiny, $"doc_id", $"text",
        Seq("hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!s.contains(4L), "docs matching no term must not score")
    assert(s(1L) > s(2L), "more term occurrences must score higher")
    assert(s(2L) > s(3L), "longer docs must be discounted at equal tf")
    assert(s.values.forall(_ > 0.0))
  }

  test("indexed search == corpus-scan search, with bucket pruning") {
    val brute = TextSearch.search(docs, $"doc_id", $"text", terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val path = Files.createTempDirectory("graft-txt").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path,
      nBuckets = 64)
    val indexed = TextSearch.searchIndexed(spark, path, terms, 20)
    assert(indexed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == brute, "index serving must reproduce the scan path exactly")

    // serving scan prunes to the probed term-bucket directories
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = TextSearch.searchIndexed(spark, path, terms, 20)
      assert(q.collect().length == 20)
      val scans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      val postings = scans.filter(_.metadata("Location").contains("postings"))
      assert(postings.nonEmpty, "expected a postings scan in the plan")
      val scan = postings.head
      assert(scan.partitionFilters.nonEmpty,
        "expected _tb partition filters on the postings scan")
      val files = scan.metrics("numFiles").value
      // 3 terms hash into ≤3 of the 64 bucket dirs
      assert(files >= 1 && files <= 3,
        s"expected at most 3 of 64 term-bucket files scanned, got $files")
      assert(scan.metadata("PushedFilters").contains("In(term"),
        s"expected term IN pushed to parquet: ${scan.metadata("PushedFilters")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("driver-side term bucket matches the Column-side routing") {
    val n = 64
    val ts = Seq("hash", "join", "stream", "a", "zebra", "", "日本語")
    val colSide = ts.toDF("t").select(
        pmod(conv(substring(md5($"t".cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(n.toLong)).cast("int"))
      .as[Int].collect().toSeq
    assert(colSide == ts.map(TextSearch.termBucketJvm(_, n)),
      "JVM-side bucket routing must match the build-side expression")
  }
}
