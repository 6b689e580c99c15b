package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** IVFADC (IVF list pruning × PQ codes): full-probe equality with the
  * flat ADC scan, probe-pruned code reads, recall against brute force,
  * and frozen-quantizer maintenance. */
class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tmpDir =
    java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"q_id", $"rank", $"n_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("probing EVERY list == the flat full-ADC scan") {
    val flat = s"$tmpDir/flat"; val ivf = s"$tmpDir/full"
    Pq.buildPqIndex(emb, flat)
    Pq.buildIvfPqIndex(emb, ivf, nCentroids = 8)
    val q = emb.filter($"vec_id" < 5)
    // nProbe = nCentroids: every inverted list is scanned, so the
    // candidate set — and with identical frozen codebooks, the ADC
    // order, shortlist, and refined ranking — equals the flat scan
    assert(rows(Pq.ivfPqTopK(spark, ivf, emb, q, 5, nProbe = 8)) ==
      rows(Pq.pqTopKIndexed(spark, flat, emb, q, 5)))
  }

  test("partial probe reads ONLY the probed inverted lists") {
    val path = s"$tmpDir/pruned"
    Pq.buildIvfPqIndex(emb, path, nCentroids = 8)
    val q = emb.filter($"vec_id" === 3)
    val got = Pq.ivfPqTopK(spark, path, emb, q, 5, nProbe = 2)
    assert(got.count() == 5)
    // the probed lists, recomputed the way serving derives them
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val qv = q.select($"embedding".cast("array<double>")).head()
      .getSeq[Double](0).toArray
    val probed = cents.map { case (cid, cv) => (cos(qv, cv), cid) }
      .sortBy { case (s, cid) => (-s, -cid) }.take(2).map(_._2).toSet
    assert(probed.size == 2)
    // every parquet file the code scan reads sits in a probed list dir
    val codes = spark.read.parquet(s"$path/data")
      .filter($"_kb".isin(probed.toSeq: _*))
    val allLists = spark.read.parquet(s"$path/data")
      .select($"_kb").distinct().count()
    assert(allLists > 2, "corpus must span more lists than the probe set")
    val scanned = codes.select(input_file_name()).distinct().collect()
      .flatMap(_.getString(0).split('/').find(_.startsWith("_kb=")))
      .map(_.stripPrefix("_kb=").toInt).toSet
    assert(scanned == probed, s"scanned $scanned, probed $probed")
    // and the plan prunes at partition level, not post-scan
    val plan = codes.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_kb"))
  }

  test("recall vs brute force is high at partial probe, perfect at full") {
    val path = s"$tmpDir/recall"
    Pq.buildIvfPqIndex(emb, path, nCentroids = 8)
    val q = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    def recall(nProbe: Int): Double = {
      val got = Pq.ivfPqTopK(spark, path, emb, q, 5, nProbe = nProbe,
          refine = emb.count().toInt)
        .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
      (got & brute).size.toDouble / brute.size
    }
    // with an unbounded refine budget the only loss is list pruning:
    // full probe must be exact; 4-of-8 lists must stay useful
    assert(recall(8) == 1.0, "full probe with full refine must be exact")
    assert(recall(4) >= 0.6, s"nProbe=4 recall ${recall(4)} too low")
  }

  test("upsert against frozen quantizers == rebuild; lists re-assign") {
    val path = s"$tmpDir/ups"; val fresh = s"$tmpDir/fresh"
    Pq.buildIvfPqIndex(emb, path, nCentroids = 8)
    val changed = emb.filter($"vec_id".between(20, 24))
      .withColumn("embedding", transform($"embedding", x => -x))
    val affected = Pq.upsertIvfPqVectors(spark, path, changed,
      deletedIds = Seq(25L))
    assert(affected.nonEmpty)
    // negated vectors land in different lists: the upsert moved rows
    // across inverted lists, not just rewrote in place
    val corpus2 = emb.filter(!$"vec_id".between(20, 25))
      .unionByName(changed)
    Pq.buildIvfPqIndex(corpus2, fresh, nCentroids = 8)
    val q = corpus2.filter($"vec_id" < 5)
    assert(rows(Pq.ivfPqTopK(spark, path, corpus2, q, 5, nProbe = 3)) ==
      rows(Pq.ivfPqTopK(spark, fresh, corpus2, q, 5, nProbe = 3)),
      "maintained IVFADC index diverges from a fresh rebuild")
  }

  test("residual IVFADC: distinct codes, exact at full probe+refine, upsert == rebuild") {
    val res = s"$tmpDir/res"; val raw = s"$tmpDir/resraw"
    Pq.buildIvfPqResidualIndex(emb, res, nCentroids = 8)
    Pq.buildIvfPqIndex(emb, raw, nCentroids = 8)
    // residual codes genuinely differ from raw-vector codes (the
    // residual distribution is a different quantization target)
    def codesOf(p: String): Map[Long, Seq[Int]] =
      spark.read.parquet(s"$p/data").select($"_id", $"codes")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val (cr, cw) = (codesOf(res), codesOf(raw))
    assert(cr.keySet == cw.keySet)
    assert(cr.exists { case (id, cs) => cw(id) != cs },
      "residual codes should not equal raw-vector codes")
    // probing every list with an unbounded refine budget is exact
    val q = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val full = Pq.ivfPqResidualTopK(spark, res, emb, q, 5, nProbe = 8,
        refine = emb.count().toInt)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(full == brute, "full probe + full refine must equal brute force")
    // upsert against frozen quantizers == rebuild; the negated delta
    // MOVES lists, exercising the residual re-encode contract
    val changed = emb.filter($"vec_id".between(20, 24))
      .withColumn("embedding", transform($"embedding", x => -x))
    assert(Pq.upsertIvfPqResiduals(spark, res, changed,
      deletedIds = Seq(25L)).nonEmpty)
    val corpus2 = emb.filter(!$"vec_id".between(20, 25))
      .unionByName(changed)
    val fresh = s"$tmpDir/resfresh"
    Pq.buildIvfPqResidualIndex(corpus2, fresh, nCentroids = 8)
    assert(rows(Pq.ivfPqResidualTopK(spark, res, corpus2,
        corpus2.filter($"vec_id" < 5), 5, nProbe = 3)) ==
      rows(Pq.ivfPqResidualTopK(spark, fresh, corpus2,
        corpus2.filter($"vec_id" < 5), 5, nProbe = 3)),
      "maintained residual index diverges from a fresh rebuild")
  }

  test("streaming IVFADC maintainer settles to the batch build+upsert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = s"$tmpDir/stream"
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val in = MemoryStream[VecChg]
    val sq = graft.streaming.Streams.maintainIvfPqIndex(spark, in.toDF(),
      path, s"$tmpDir/sckpt", nCentroids = 8)
    // batch 1 builds (quantizers frozen from it); batch 2 re-embeds
    // 20..24 (moving lists) and tombstones 25
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
    Pq.buildIvfPqIndex(corpus2, fresh, nCentroids = 8)
    val q = corpus2.filter($"vec_id" < 5)
    assert(rows(Pq.ivfPqTopK(spark, path, corpus2, q, 5, nProbe = 3)) ==
      rows(Pq.ivfPqTopK(spark, fresh, corpus2, q, 5, nProbe = 3)))
  }
}
