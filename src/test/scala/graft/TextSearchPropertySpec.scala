package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextSearch

/** Randomized check: BM25 scoring and TF-IDF vectors against a
  * driver-side model implementing the formulas directly over the
  * collected token lists — catches formula drift (idf smoothing, dl
  * normalization, collision folding) that the fixed-corpus oracle
  * can't distinguish from a compensating error. */
class TextSearchPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val words =
    Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet")

  private def corpusGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" "))))

  private def modelBm25(docs: Seq[(Long, String)], terms: Seq[String],
                        k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Double] = {
    val toks = docs.map { case (i, t) =>
      i -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty)
    val n = toks.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    toks.flatMap { case (i, ws) =>
      val perTerm = terms.sorted.map { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0 || df(t) == 0) 0.0
        else {
          val idf = math.log(((n - df(t)).toDouble + 0.5) /
            (df(t).toDouble + 0.5) + 1.0)
          idf * (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * (1.0 - b + b * ws.size.toDouble / avgdl))
        }
      }
      val s = perTerm.reduceLeft(_ + _)
      if (terms.exists(t => ws.contains(t)))
        Some(i -> (math.floor(s * 10000.0 + 0.5) / 10000.0))
      else None
    }.toMap
  }

  test("bm25Scores equals the direct formula on random corpora") {
    (1 to 5).foreach { trial =>
      val docs = corpusGen(Gen.Parameters.default, Seed(trial.toLong))
        .get.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val terms = Seq(words(trial % words.size), words((trial + 3) % words.size))
      val got = TextSearch.bm25Scores(docs.toDF("doc_id", "text"),
          $"doc_id", $"text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val exp = modelBm25(docs, terms)
      assert(got.keySet == exp.keySet, s"trial $trial: candidate sets differ")
      got.foreach { case (id, s) =>
        assert(math.abs(s - exp(id)) < 1e-9,
          s"trial $trial doc $id: $s vs ${exp(id)}")
      }
    }
  }

  test("tfidf vectors: slot weights equal the direct formula") {
    val docs = Seq((1L, "alpha alpha bravo"), (2L, "bravo charlie"),
      (3L, "alpha delta delta delta"))
    val dim = 16
    val got = TextSearch.tfidfVectors(docs.toDF("doc_id", "text"),
        $"doc_id", $"text", dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val toks = docs.map { case (i, t) => i -> t.split(" ").toSeq }
    val n = toks.size.toLong
    val vocab = toks.flatMap(_._2).distinct
    val df = vocab.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val exp = toks.map { case (i, ws) =>
      val v = Array.fill(dim)(0L)
      ws.distinct.foreach { t =>
        val tf = ws.count(_ == t).toLong
        val idf6 = math.floor((math.log((n.toDouble + 1.0) /
          (df(t).toDouble + 1.0)) + 1.0) * 1000000.0 + 0.5).toLong
        v(TextSearch.termBucketJvm(t, dim)) += tf * idf6
      }
      i -> v.map(_.toDouble / 1000000.0).toSeq
    }.toMap
    assert(got == exp)
  }
}
