package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Relational}

/** Randomized model checks for the round-7 layout/dedup operators:
  * driver-side reference implementations of the documented contracts,
  * compared against the distributed results on generated inputs. */
class PipelinePropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("dedupParagraphs matches the keep-first model on random corpora") {
    val para = Gen.oneOf("aa", "bb", "cc", "dd", "", " ", "aa ", "ee ff")
    val doc = Gen.listOfN(5, para).flatMap(ps =>
      Gen.choose(0, 5).map(n => ps.take(n)))
    val corpus = Gen.listOfN(12, doc)
    for (seed <- 1L to 8L) {
      val docs = sample(corpus, seed).zipWithIndex
        .map { case (ps, i) => (i.toLong, ps) }
      // model: an instance survives iff blank, or first (doc,pos) of
      // its trimmed content
      val firstOf = docs.flatMap { case (id, ps) =>
        ps.zipWithIndex.collect { case (p, pos) if p.trim.nonEmpty =>
          (p.trim, (id, pos)) }
      }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val model = docs.map { case (id, ps) =>
        val kept = ps.zipWithIndex.filter { case (p, pos) =>
          p.trim.isEmpty || firstOf(p.trim) == ((id, pos)) }.map(_._1)
        (id, kept.mkString("|"), ps.length.toLong, kept.length.toLong)
      }
      val got = Dedup.dedupParagraphs(docs.toDF("doc_id", "paras"),
          $"doc_id", $"paras", sep = "|")
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == model, s"seed=$seed")
    }
  }

  test("shardByTokenBudget matches the scan model on random token counts") {
    val counts = Gen.listOfN(40, Gen.choose(0L, 30L))
    for (seed <- 1L to 8L) {
      val docs = sample(counts, seed).zipWithIndex
        .map { case (n, i) => (i.toLong, n) }
      val budget = 50L
      // model: md5-of-id order, exclusive prefix sum, budget quotient
      def h(id: Long) = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      var cum = 0L
      val model = docs.sortBy { case (id, _) => (h(id), id) }
        .map { case (id, n) =>
          val r = (id, n, cum, cum / budget); cum += n; r }
        .sortBy(_._1)
      val got = Relational.shardByTokenBudget(
          docs.toDF("doc_id", "n"), $"doc_id", $"n", budget)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == model, s"seed=$seed")
    }
  }
}
