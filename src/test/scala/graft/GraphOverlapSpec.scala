package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class GraphOverlapSpec extends SparkSpecBase {

  test("corpusOverlap: exact containment/jaccard on a known construction") {
    import spark.implicits._
    // docs of 4 tokens → 2 distinct 3-shingles each; overlap by design:
    // A = {a b c d}, {x y z w};  B = {a b c d} (dup of A's first), {p q r s}
    val a = Seq((0L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val b = Seq((1L, "a b c d"), (3L, "p q r s")).toDF("doc_id", "text")
    val r = Dedup.corpusOverlap(a, b, col("doc_id"), col("text")).head()
    // each side: 4 distinct shingles; intersection: the 2 of "a b c d"
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 4L, 2L))
    assert(r.getDouble(3) == 0.5)                // containment_a = 2/4
    assert(math.abs(r.getDouble(4) - 0.3333) < 1e-9) // jaccard 2/6 → 0.3333
  }

  test("corpusOverlap: disjoint corpora give zero, identical give one") {
    import spark.implicits._
    val a = Seq((0L, "one two three four")).toDF("doc_id", "text")
    val b = Seq((1L, "five six seven eight")).toDF("doc_id", "text")
    val z = Dedup.corpusOverlap(a, b, col("doc_id"), col("text")).head()
    assert(z.getLong(2) == 0L && z.getDouble(3) == 0.0)
    val i = Dedup.corpusOverlap(a, a, col("doc_id"), col("text")).head()
    assert(i.getLong(2) == i.getLong(0) && i.getDouble(3) == 1.0 &&
      i.getDouble(4) == 1.0)
  }

  test("knnGraph: single cluster equals brute-force all-pairs ranking") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(vecs, k = 3, nCentroids = 1)
      .orderBy("src", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = Similarity.bruteForceTopK(vecs, vecs, 3)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.toSeq == brute.toSeq)
  }

  test("knnGraph: multi-probe recall rises monotonically to brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 150L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    def edges(nProbe: Int) =
      Similarity.knnGraph(vecs, k = 3, nCentroids = 6, nProbe = nProbe)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(vecs, vecs, 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = (edges(1) & brute).size
    val r2 = (edges(2) & brute).size
    assert(r1 <= r2, s"recall must not drop with more probes: $r1 > $r2")
    // probing every cluster IS brute force
    assert(edges(6) == brute)
  }

  test("knnGraph: ranks are contiguous, bounded by k, mutual is symmetric") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 120L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val rows = Similarity.knnGraph(vecs, k = 4, nCentroids = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.values.forall(es =>
      es.length <= 4 && es.map(_._2).sorted.toSeq == (1L to es.length)))
    val edgeSet = rows.map(e => (e._1, e._3)).toSet
    rows.foreach { case (s, _, d, m) =>
      assert(m == edgeSet.contains((d, s)), s"mutual flag wrong for $s->$d")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4),
      "expect both mutual and one-way edges")
  }
}
