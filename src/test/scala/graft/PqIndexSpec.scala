package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Persisted PQ index: frozen codebooks, bucket-local maintenance,
  * serve == scan-time semantics. */
class PqIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft-pqidx").toString
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def fileHashes(dir: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        root.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
      }.toMap
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"q_id", $"rank", $"n_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("indexed serve == scan-time pqTopK") {
    val path = s"$tmpDir/base"
    Pq.buildPqIndex(emb, path)
    val q = emb.filter($"vec_id" < 5)
    assert(rows(Pq.pqTopKIndexed(spark, path, emb, q, 5)) ==
      rows(Pq.pqTopK(emb, q, 5)))
  }

  test("upsert == rebuild end-to-end; untouched id buckets byte-identical") {
    val path = s"$tmpDir/ups"; val fresh = s"$tmpDir/fresh"
    Pq.buildPqIndex(emb, path)
    val before = fileHashes(s"$path/data")

    val changed = emb.filter($"vec_id".between(20, 24))
      .withColumn("embedding", transform($"embedding", x => -x))
    val affected = Pq.upsertPqVectors(spark, path, changed,
      deletedIds = Seq(25L))
    assert(affected.nonEmpty)

    // rebuild from the modified corpus; codebooks must agree because
    // init reads vec_id < 16, which the delta leaves untouched
    val corpus2 = emb.filter(!$"vec_id".between(20, 25))
      .unionByName(changed)
    Pq.buildPqIndex(corpus2, fresh)
    val q = corpus2.filter($"vec_id" < 5)
    assert(rows(Pq.pqTopKIndexed(spark, path, corpus2, q, 5)) ==
      rows(Pq.pqTopKIndexed(spark, fresh, corpus2, q, 5)),
      "maintained index diverges from a fresh rebuild")

    val after = fileHashes(s"$path/data")
    val touched = (before.keySet ++ after.keySet)
      .filter(f => before.get(f) != after.get(f)).map(_.split("/")(0))
    val expected = affected.map(b => s"_kb=$b").toSet
    assert(touched.subsetOf(expected),
      s"rewrote buckets beyond the changed ids: ${touched -- expected}")
  }

  test("codebooks are FROZEN across upserts") {
    val path = s"$tmpDir/frozen"
    Pq.buildPqIndex(emb, path)
    val cb0 = fileHashes(s"$path/codebooks")
    // a delta that would shift data-derived codebooks if re-derived
    val changed = emb.filter($"vec_id" < 16)
      .withColumn("embedding", transform($"embedding", x => x * 3.0f))
    Pq.upsertPqVectors(spark, path, changed)
    assert(fileHashes(s"$path/codebooks") == cb0,
      "upsert must never re-derive codebooks")
  }

  test("streaming maintainer settles to the batch build+upsert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = s"$tmpDir/stream"
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val in = MemoryStream[VecChg]
    val sq = graft.streaming.Streams.maintainPqIndex(spark, in.toDF(),
      path, s"$tmpDir/ckpt")
    // batch 1 builds (codebooks frozen from it); batch 2 re-embeds
    // 20..24 and tombstones 25
    in.addData(all.map { case (id, e) => VecChg(id, e, _deleted = false) }
      .toSeq: _*)
    sq.processAllAvailable()
    val changed = all.filter(x => x._1 >= 20 && x._1 <= 24)
      .map { case (id, e) => VecChg(id, e.map(-_), _deleted = false) }
    in.addData(
      (changed :+ VecChg(25L, Array.empty[Float], _deleted = true)).toSeq: _*)
    sq.processAllAvailable()
    sq.stop()
    assert(graft.view.IndexStore.readMeta(spark, path).updateSeq == 2L)
    val corpus2 = emb.filter(!$"vec_id".between(20, 25))
      .select($"vec_id", $"embedding")
      .unionByName(changed.toSeq.toDF("vec_id", "embedding", "_deleted")
        .select($"vec_id", $"embedding"))
    val fresh = s"$tmpDir/stream_fresh"
    Pq.buildPqIndex(corpus2, fresh)
    val q = corpus2.filter($"vec_id" < 5)
    assert(rows(Pq.pqTopKIndexed(spark, path, corpus2, q, 5)) ==
      rows(Pq.pqTopKIndexed(spark, fresh, corpus2, q, 5)))
  }
}
