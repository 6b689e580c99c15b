package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  * Scalar math uses an in-order left fold (`aggregate` over `zip_with`)
  * so the result is deterministic and engine-reproducible; everything
  * stays in whole-stage codegen. */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** In-order dot product — deterministic accumulation, same value in
    * any engine that folds left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force exact top-k cosine neighbors for a (small, broadcast)
    * query set: the baseline. Scales as |queries| × n — fine for
    * interactive query sets against any corpus size; the LSH variant is
    * the all-pairs scale path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"))
    c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Exact near-duplicate pairs within a blocking key (e.g. a cluster
    * label or an LSH bucket): pairwise only inside blocks, never a full
    * cross product. */
  def blockedNearDupPairs(emb: DataFrame, block: Column, threshold: Double)
      : DataFrame = {
    val e = emb.select(block.as("blk"), col("vec_id"), col("embedding"))
    val a = e.select(col("blk"), col("vec_id").as("id_a"),
      col("embedding").as("v_a"))
    val b = e.select(col("blk"), col("vec_id").as("id_b"),
      col("embedding").as("v_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `d`: xxhash64 → uniform in [-0.5, 0.5). */
  private def planeWeight(p: Int, d: Column): Column =
    (pmod(xxhash64(concat_ws(":", lit(p), d)), lit(1000003L))
      .cast("double") / 1000003.0) - 0.5

  /** Random-hyperplane LSH signature: `planes` sign bits. */
  def lshSignature(vec: Column, planes: Int): Column = {
    val v = asDouble(vec)
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, d) => x * planeWeight(p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L)).otherwise(lit(0L)) * (1L << p)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate nearest neighbors with multi-probe: the
    * query probes its own bucket plus every bucket at hamming distance 1
    * (signature with one plane bit flipped) — the standard recall fix
    * without growing the corpus index. Candidate count ~
    * n·(planes+1)/2^planes per query instead of n. Approximate —
    * spec-gated against the brute-force baseline. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"),
      lshSignature(col("embedding"), planes).as("bucket"))
    val probes = (0 until planes).foldLeft(array(col("_sig"))) {
      (acc, p) => array_append(acc, col("_sig").bitwiseXOR(lit(1L << p)))
    }
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_vec"),
      lshSignature(col("embedding"), planes).as("_sig"))
      .select(col("q_id"), col("q_vec"), explode(probes).as("bucket"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec")).distinct()
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cos"), 4).as("cos"))
  }
}
