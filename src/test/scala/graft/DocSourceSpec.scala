package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.DocSource

class DocSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("JSONL round trip preserves text exactly (newlines, quotes, unicode)") {
    val dir = java.nio.file.Files.createTempDirectory("docsrc").toString
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "line1\nline2\ttab \"quoted\"", "en"),
      (3L, "ünïcodé — emoji ☃ \\backslash", "de"))
      .toDF("doc_id", "text", "lang")
    DocSource.writeJsonl(docs, s"$dir/out")
    val (good, bad) = DocSource.readJsonl(spark, s"$dir/out", target)
    assert(bad.count() == 0)
    assert(good.orderBy("doc_id").as[(Long, String, String)].collect().toSeq ==
      docs.orderBy("doc_id").as[(Long, String, String)].collect().toSeq)
  }

  test("malformed lines are quarantined, not dropped or fatal") {
    val dir = java.nio.file.Files.createTempDirectory("docsrc2").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"doc_id": 1, "text": "ok", "lang": "en"}
        |this is not json
        |{"doc_id": 2, "text": "also ok", "lang": "fr"}
        |{"doc_id": broken
        |""".stripMargin)
    val (good, bad) = DocSource.readJsonl(spark, s"$dir/in.jsonl", target)
    assert(good.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(bad.count() == 2)
  }

  test("additive schema drift: missing target columns read as typed nulls") {
    val dir = java.nio.file.Files.createTempDirectory("docsrc3").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"doc_id": 7, "text": "no lang field", "extra": 42}
        |""".stripMargin)
    val (good, bad) = DocSource.readJsonl(spark, s"$dir/in.jsonl", target)
    assert(bad.count() == 0)
    val row = good.head()
    assert(row.getLong(0) == 7L && row.isNullAt(2))
    assert(!good.columns.contains("extra"))
  }

  test("CSV round trip with embedded newlines and quotes") {
    val dir = java.nio.file.Files.createTempDirectory("docsrc4").toString
    val docs = Seq(
      (1L, "a,b\n\"second\" line", "en"),
      (2L, "simple", "fr")).toDF("doc_id", "text", "lang")
    DocSource.writeCsv(docs, s"$dir/out")
    val (good, bad) = DocSource.readCsv(spark, s"$dir/out", target)
    assert(bad.count() == 0)
    assert(good.orderBy("doc_id").as[(Long, String, String)].collect().toSeq ==
      docs.orderBy("doc_id").as[(Long, String, String)].collect().toSeq)
  }
}
