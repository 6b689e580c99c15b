package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSpecBase {

  private def emb: DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("codes are m entries in [0, ks); encoding is deterministic") {
    val cbs = Pq.initCodebooks(emb, m = 8, ks = 16)
    val codes = Pq.encode(emb, cbs).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
    val again = Pq.encode(emb, cbs).collect()
    assert(codes.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("ADC with full refine == brute force exactly") {
    // shortlisting EVERY candidate makes the exact-refine stage the
    // whole ranking: PQ output must equal brute force bit-for-bit
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val got = Pq.pqTopK(emb, q, k = 5, refine = n).collect().toSeq
    val want = Similarity.bruteForceTopK(emb, q, 5).collect().toSeq
    assert(got.sortBy(_.toString) == want.sortBy(_.toString))
  }

  test("ADC shortlist recall vs brute force is high at modest refine") {
    val q = emb.filter(col("vec_id") < 10)
    val got = Pq.pqTopK(emb, q, k = 5, refine = 50).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = Similarity.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & want).size.toDouble / want.size
    assert(recall >= 0.5, s"recall $recall")
    // Lloyd-refined codebooks must not hurt recall
    val refined = Pq.pqTopK(emb, q, k = 5, refine = 50, refineIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall2 = (refined & want).size.toDouble / want.size
    assert(recall2 >= recall - 0.15, s"refined $recall2 vs $recall")
  }

  test("broadcast codebook tier == literal tier exactly (codes and ADC)") {
    // the test seam forces the big-ks path over the SAME codebooks the
    // literal plan embeds: identical codes, identical rankings — the
    // broadcast loop must replay the literal expression's double-op
    // sequence and tie rules exactly
    val cbs = Pq.initCodebooks(emb, m = 8, ks = 16)
    val q = emb.filter(col("vec_id") < 5)
    // force the literal tier on BOTH paths for the baseline arm
    // (encode defaults to the broadcast tier since the assignment
    // argmin left codegen — literalAssignMax = 0)
    val savedAssign = Pq.literalAssignMax
    val saved = Pq.literalCodebookMax
    Pq.literalAssignMax = 256
    val (litCodes, litTop) = try {
      (Pq.encode(emb, cbs).collect().map(_.toString).sorted.toSeq,
        Pq.adcTopK(Pq.encode(emb, cbs), emb, q, cbs,
          k = 5, refine = 50).collect().map(_.toString).sorted.toSeq)
    } finally Pq.literalAssignMax = savedAssign
    try {
      Pq.literalCodebookMax = 1
      Pq.literalAssignMax = 0
      val bcCodes = Pq.encode(emb, cbs).collect().map(_.toString).sorted.toSeq
      assert(bcCodes == litCodes, "broadcast encode diverges from literal")
      val bcTop = Pq.adcTopK(Pq.encode(emb, cbs), emb, q, cbs,
        k = 5, refine = 50).collect().map(_.toString).sorted.toSeq
      assert(bcTop == litTop, "broadcast ADC ranking diverges from literal")
      // and the plan really is UDF-scored, not literal-table-scored
      val plan = Pq.encode(emb, cbs).queryExecution.optimizedPlan.toString()
      assert(plan.contains("UDF"), s"expected broadcast UDF tier in:\n$plan")
    } finally { Pq.literalCodebookMax = saved
      Pq.literalAssignMax = savedAssign }
  }
}
