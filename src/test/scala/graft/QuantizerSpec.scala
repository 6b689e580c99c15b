package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The round-6 `weak`: centroids as plan literals cap the quantizer at
  * O(100) centroids while SemDeDup/large-IVF need 10k+. The lift keeps
  * the literal/codegen path below [[Similarity.literalCentroidMax]] and
  * switches to a SparkContext-broadcast + compiled-loop argmax above it.
  * These specs pin the contract: BOTH paths produce byte-identical
  * assignments, probes, and dedup verdicts over the same quantizer. */
class QuantizerSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft-quant").toString
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def withLiteralMax[A](m: Int)(f: => A): A = {
    val old = Similarity.literalCentroidMax
    Similarity.literalCentroidMax = m
    try f finally Similarity.literalCentroidMax = old
  }

  test("IVF at nCentroids=512: broadcast path == literal path") {
    // 500 vectors -> 500 effective centroids; both far above the
    // default literal ceiling of 64
    val pLit = s"$tmpDir/ivf_lit"; val pBc = s"$tmpDir/ivf_bc"
    withLiteralMax(4096) {
      Similarity.buildIvfIndex(emb, pLit, nCentroids = 512)
    }
    withLiteralMax(4) {
      Similarity.buildIvfIndex(emb, pBc, nCentroids = 512)
    }
    def rows(p: String) = spark.read.parquet(s"$p/data")
      .select(col("_id").cast("long"), col("_kb").cast("int"))
      .as[(Long, Int)].collect().toSet
    val (a, b) = (rows(pLit), rows(pBc))
    assert(a.nonEmpty && a == b, "assignments must be identical")

    val q = emb.filter($"vec_id" < 5)
    def topk(p: String) = withLiteralMax(
      if (p == pLit) 4096 else 4) {
      Similarity.ivfTopK(spark, p, q, 5, nProbe = 4)
        .as[(Long, Long, Long, Double)].collect().toSet
    }
    assert(topk(pLit) == topk(pBc), "probed top-k must be identical")
  }

  test("semDedup with refinement: broadcast path == literal path") {
    def run(m: Int) = withLiteralMax(m) {
      Similarity.semDedup(emb, tau = 0.2, nCentroids = 128,
        refineIters = 1)
        .select(col("vec_id").cast("long"), col("cluster").cast("int"),
          col("keep"))
        .as[(Long, Int, Boolean)].collect().toSet
    }
    val lit = run(4096)
    val bc = run(4)
    assert(lit.nonEmpty && lit == bc,
      "cluster + keep verdicts must be identical across paths")
  }

  test("default small-k path is unchanged (literal, zero-UDF plan)") {
    // guards the round-6 gate hashes: k=16 stays on the codegen path
    val p = s"$tmpDir/ivf_small"
    Similarity.buildIvfIndex(emb, p, nCentroids = 16)
    val plan = Similarity.ivfTopK(spark, p, emb.filter($"vec_id" < 3), 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"small-k probe must stay literal:\n$plan")
  }
}
