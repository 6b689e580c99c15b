package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Persisted SemDeDup index (round-6 verdict item 4): build + upsert +
  * serve must carry the exact scan-time semantics, with maintenance
  * touching only the affected clusters. */
class SemDedupIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft-semdd").toString
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

  private def verdicts(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id").cast("long"), col("cluster").cast("int"),
      col("keep")).as[(Long, Int, Boolean)].collect().toSet

  test("built index serves exactly the scan-time semDedup verdicts") {
    val path = s"$tmpDir/base"
    Similarity.buildSemDedupIndex(emb, path, tau = 0.3)
    assert(verdicts(Similarity.semDedupVerdicts(spark, path)) ==
      verdicts(Similarity.semDedup(emb, tau = 0.3)))
  }

  test("upsert == rebuild; untouched cluster buckets byte-identical") {
    val path = s"$tmpDir/ups"; val fresh = s"$tmpDir/fresh"
    Similarity.buildSemDedupIndex(emb, path, tau = 0.3)
    val before = fileHashes(s"$path/data")

    // re-embed 5 vectors (negation flips their cluster), delete one
    val changed = emb.filter($"vec_id".between(20, 24))
      .withColumn("embedding", transform($"embedding", x => -x))
    val affected =
      Similarity.upsertSemDedupVectors(spark, path, changed,
        deletedIds = Seq(25L))
    assert(affected.nonEmpty)

    val corpus2 = emb.filter(!$"vec_id".between(20, 25))
      .unionByName(changed)
    Similarity.buildSemDedupIndex(corpus2, fresh, tau = 0.3)
    // quantizers agree: both were initialized from vec_id < 16, which
    // the delta leaves untouched — so end-to-end equality is exact
    assert(verdicts(Similarity.semDedupVerdicts(spark, path)) ==
      verdicts(Similarity.semDedupVerdicts(spark, fresh)),
      "maintained index diverges from a fresh rebuild")

    val after = fileHashes(s"$path/data")
    val touched = (before.keySet ++ after.keySet)
      .filter(f => before.get(f) != after.get(f)).map(_.split("/")(0))
    val expected = affected.map(b => s"_kb=$b").toSet
    assert(touched.subsetOf(expected),
      s"rewrote buckets beyond the affected clusters: " +
        s"${touched -- expected}")
  }

  test("deleting a dup-winner resurrects the cluster-mates it shadowed") {
    // two synthetic identical vectors + a disjoint one, tiny corpus:
    // id 1 shadows id 2 (cos=1 >= tau); deleting 1 must flip 2 to keep
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val path = s"$tmpDir/resurrect"
    Similarity.buildSemDedupIndex(tiny, path, tau = 0.5, nCentroids = 1)
    val v0 = verdicts(Similarity.semDedupVerdicts(spark, path))
      .map(t => t._1 -> t._3).toMap
    assert(v0(1L) && !v0(2L) && v0(3L))
    Similarity.upsertSemDedupVectors(spark, path,
      tiny.limit(0), deletedIds = Seq(1L))
    val v1 = verdicts(Similarity.semDedupVerdicts(spark, path))
      .map(t => t._1 -> t._3).toMap
    assert(v1 == Map(2L -> true, 3L -> true),
      s"deletion must resurrect the shadowed mate: $v1")
  }
}
