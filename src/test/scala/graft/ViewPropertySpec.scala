package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.collation.CollationCodec
import graft.view.{QueryOpts, View}

/** Randomized check: View.query's map-phase semantics (range filters,
  * key lookups, ordering, skip/limit) against a driver-side model that
  * implements the CouchDB query contract directly over the collected
  * view rows. */
class ViewPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  // key = o_totalprice (double), id = o_orderkey
  private lazy val view = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
  private lazy val modelRows: Seq[(Long, Double)] = orders
    .select($"o_orderkey", $"o_totalprice").as[(Long, Double)].collect().toSeq

  private def modelQuery(rows: Seq[(Long, Double)], o: QueryOpts): Seq[Long] = {
    def enc(k: Any) = CollationCodec.encodeScala(k)
    def cmp(a: Array[Byte], b: Array[Byte]) = CollationCodec.compareBytes(a, b)
    var r = rows.map { case (id, k) => (id, enc(k)) }
    o.key.foreach(k => r = r.filter(x => cmp(x._2, enc(k)) == 0))
    o.keys.foreach(ks => r = r.filter(x => ks.exists(k => cmp(x._2, enc(k)) == 0)))
    if (!o.descending) {
      o.startKey.foreach(k => r = r.filter(x => cmp(x._2, enc(k)) >= 0))
      o.endKey.foreach(k => r = r.filter(x =>
        if (o.inclusiveEnd) cmp(x._2, enc(k)) <= 0 else cmp(x._2, enc(k)) < 0))
    } else {
      o.startKey.foreach(k => r = r.filter(x => cmp(x._2, enc(k)) <= 0))
      o.endKey.foreach(k => r = r.filter(x =>
        if (o.inclusiveEnd) cmp(x._2, enc(k)) >= 0 else cmp(x._2, enc(k)) > 0))
    }
    val sorted = r.sortWith { (a, b) =>
      val c = cmp(a._2, b._2)
      val lt = if (c != 0) c < 0 else a._1 < b._1
      if (o.descending) !lt else lt
    }
    sorted.map(_._1).drop(o.skip.toInt)
      .take(o.limit.map(_.toInt).getOrElse(Int.MaxValue))
  }

  test("random QueryOpts agree with the driver-side model") {
    val prices = modelRows.map(_._2)
    val keyGen: Gen[Double] = Gen.oneOf(
      Gen.oneOf(prices), Gen.chooseNum(prices.min - 10, prices.max + 10))
    val optsGen: Gen[QueryOpts] = for {
      useStart <- Gen.prob(0.6); start <- keyGen
      useEnd <- Gen.prob(0.6); end <- keyGen
      incl <- Gen.oneOf(true, false)
      desc <- Gen.oneOf(true, false)
      useKey <- Gen.prob(0.2); key <- Gen.oneOf(prices)
      skip <- Gen.oneOf(0L, 1L, 7L, 1000L)
      limit <- Gen.oneOf(None, Some(1L), Some(13L), Some(100000L))
    } yield QueryOpts(
      startKey = if (useStart) Some(start) else None,
      endKey = if (useEnd) Some(end) else None,
      inclusiveEnd = incl, descending = desc,
      key = if (useKey) Some(key) else None,
      skip = skip, limit = limit, reduce = false)

    (0 until 60).foreach { i =>
      val o = optsGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = view.query(o).select($"id").as[Long].collect().toSeq
      val exp = modelQuery(modelRows, o)
      assert(got == exp, s"opts=$o got=${got.take(5)}... exp=${exp.take(5)}...")
    }
  }

  test("random queryMany batches equal per-query answers, query by query") {
    val prices = modelRows.map(_._2)
    val keyGen: Gen[Double] = Gen.oneOf(
      Gen.oneOf(prices), Gen.chooseNum(prices.min - 10, prices.max + 10))
    val optsGen: Gen[QueryOpts] = for {
      useStart <- Gen.prob(0.7); start <- keyGen
      useEnd <- Gen.prob(0.7); end <- keyGen
      incl <- Gen.oneOf(true, false)
      desc <- Gen.oneOf(true, false)
      useKey <- Gen.prob(0.15); key <- Gen.oneOf(prices)
      skip <- Gen.oneOf(0L, 3L, 40L)
      limit <- Gen.oneOf(None, Some(5L), Some(60L), Some(100000L))
    } yield QueryOpts(
      startKey = if (useStart) Some(start) else None,
      endKey = if (useEnd) Some(end) else None,
      inclusiveEnd = incl, descending = desc,
      key = if (useKey) Some(key) else None,
      skip = skip, limit = limit, reduce = false)
    val batchGen = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, optsGen))
    (0 until 12).foreach { i =>
      val batch = batchGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val tagged = view.queryMany(batch).collect()
        .groupBy(_.getInt(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
      batch.zipWithIndex.foreach { case (o, qi) =>
        val exp = modelQuery(modelRows, o)
        assert(tagged.getOrElse(qi, Seq.empty) == exp,
          s"batch $i query $qi: opts=$o " +
            s"got=${tagged.getOrElse(qi, Seq.empty).take(5)}... " +
            s"exp=${exp.take(5)}...")
      }
    }
  }
}
