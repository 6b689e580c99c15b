package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val assets = Multimodal.assetsFromDocs(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("asset table carries binary payload + typed metadata") {
    val row = assets.filter($"doc_id" === 0).collect().head
    val payload = row.getAs[Array[Byte]]("payload")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(payload.nonEmpty)
    assert(meta.getAs[String]("format") == "fake/raw")
    assert(meta.getAs[Long]("n_bytes") == payload.length.toLong)
    assert(meta.getAs[Int]("width") == 32 && meta.getAs[Int]("height") == 24)
  }

  test("mapPartitions feature extraction is deterministic and distributed") {
    val feats = Multimodal.extractFeatures(assets.repartition(4))
    assert(feats.rdd.getNumPartitions == 4)
    val f = feats.filter($"doc_id" === 0).collect().head
    val bytes = assets.filter($"doc_id" === 0)
      .select($"payload").collect().head.getAs[Array[Byte]](0)
    assert(f.n_bytes == bytes.length.toLong)
    assert(f.head_hex == bytes.take(8).map(b => f"$b%02X").mkString)
    assert(f.byte_sum == bytes.map(_ & 0xFF).map(_.toLong).sum)
    assert(feats.count() == assets.count())
  }

  test("frame sampling slices the payload at fixed strides") {
    val framed = Multimodal.sampleFrames(assets, frameBytes = 16, stride = 4)
    val r = framed.filter($"doc_id" === 1).select($"frames", $"payload")
      .collect().head
    val frames = r.getSeq[Array[Byte]](0)
    val payload = r.getAs[Array[Byte]](1)
    assert(frames.nonEmpty)
    assert(frames.head.sameElements(payload.take(16)))
    frames.foreach(fr => assert(fr.length <= 16))
  }

  test("compiled phash equals the Column-formula reference on real payloads") {
    // the gate's compiled loop vs the oracle-replayable builtin chain,
    // byte-for-byte on a slice of the corpus
    import org.apache.spark.sql.functions._
    val sample = assets.filter(octet_length($"payload") >= 64).limit(50)
    def collectHashes(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toList, r.getSeq[Long](2).toList)).toMap
    val ref = collectHashes(sample.select($"doc_id",
        Multimodal.aHashBits(Multimodal.pooledPixels($"payload")).as("bits"))
      .withColumn("bands", Multimodal.hashBands($"bits"))
      .select($"doc_id", $"bits", $"bands"))
    val fast = collectHashes(Multimodal.phashes(sample))
    assert(ref.nonEmpty && ref == fast,
      "compiled hash must equal the Column reference")
  }

  test("phash near-dup: identical payloads pair at hamming 0; perturbation grows distance") {
    import org.apache.spark.sql.functions._
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val tweaked = base.replace("quick", "quack")
    val far = base.map(c => if (c.isLetter) ('a' + ((c - 'a' + 13) % 26)).toChar else c)
    val d = Seq((1L, base), (2L, base), (3L, tweaked), (4L, far.mkString))
      .toDF("doc_id", "text")
    val out = Multimodal.phashNearDupPairs(Multimodal.assetsFromDocs(d),
        maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 0L, s"identical payloads must hash equal: $out")
    out.get((1L, 3L)).foreach(h13 =>
      out.get((1L, 4L)).foreach(h14 =>
        assert(h13 <= h14, s"small tweak must stay closer: $out")))
    // dhash variant runs and keeps the exact-dup-at-0 contract
    val dh = Multimodal.phashNearDupPairs(Multimodal.assetsFromDocs(d),
        maxHamming = 0, method = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dh.contains((1L, 2L)))
  }

  test("JPEG decode: dims exact, gray mean within DC tolerance, PNG twin exact") {
    val seed = 11L
    val exp = Multimodal.syntheticGrayMean(seed, 32, 32)
    // the analytic reference IS the PNG decode (lossless round-trip)
    val png = Multimodal.decodeGray64(
      Multimodal.syntheticPng(seed, perturb = false, 32, 32)).get
    assert(png.sum / 64 == exp, "analytic mean must equal PNG decode")
    val mixed = Seq(
      (1L, Multimodal.syntheticJpeg(seed, 32, 32)),
      (2L, "jpeg? definitely not a jpeg payload at all".getBytes))
      .toDF("doc_id", "payload")
    val feats = Multimodal.decodeFeatures(mixed).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).decoded && feats(1L).width == 32 &&
      feats(1L).height == 32, s"jpeg dims wrong: ${feats(1L)}")
    // JPEG is lossy but DC survives quantization: the pooled mean
    // lands within a few levels of the raster's analytic mean
    assert((feats(1L).gray_mean - exp).abs <= 6,
      s"jpeg mean drifted: got ${feats(1L).gray_mean}, raster $exp")
    assert(!feats(2L).decoded, "corrupt payload must quarantine")
  }

  test("real decode: PNG roundtrips the formula raster exactly (stub vs real)") {
    // decode-pool of the synthetic PNG == direct formula pooling
    val png = Multimodal.syntheticPng(7L, perturb = false)
    val px = Multimodal.decodeGray64(png).get
    val want = (0 until 8).flatMap { j =>
      (0 until 8).map { i =>
        val vals = for (dy <- 0 to 1; dx <- 0 to 1)
          yield (7L * 31 + (2 * i + dx) * 7 + (2 * j + dy) * 13) % 256
        vals.sum / 4
      }
    }
    assert(px.toSeq == want,
      s"decoded thumbnail diverges from the formula:\n${px.toSeq}\n$want")
    // the perturbation moves SOME pooled cells, by at most 1 level
    val px2 = Multimodal.decodeGray64(
      Multimodal.syntheticPng(7L, perturb = true)).get
    val deltas = px.zip(px2).map { case (a, b) => (b - a).abs }
    assert(deltas.exists(_ > 0) && deltas.forall(_ <= 1))
    // undecodable payloads quarantine: None from decode, dropped from
    // the hash relation, decoded=false (row kept) in decodeFeatures
    assert(Multimodal.decodeGray64("not an image".getBytes).isEmpty)
    val mixed = Seq(
      (1L, Multimodal.syntheticPng(1L, perturb = false)),
      (2L, "junk bytes junk bytes junk bytes junk bytes junk bytes junk"
        .getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.imagePhashes(mixed).select($"doc_id")
      .as[Long].collect().toSeq == Seq(1L))
    val feats = Multimodal.decodeFeatures(mixed).collect()
      .map(f => f.doc_id -> f).toMap
    val m1 = Multimodal.decodeGray64(
      Multimodal.syntheticPng(1L, perturb = false)).get.sum / 64
    assert(feats(1L).decoded && feats(1L).width == 16 &&
      feats(1L).height == 16 && feats(1L).gray_mean == m1)
    assert(!feats(2L).decoded && feats(2L).n_bytes > 0)
    // identical images pair at hamming 0 through the DECODED path
    val trio = Seq(
      (1L, Multimodal.syntheticPng(3L, perturb = false)),
      (2L, Multimodal.syntheticPng(3L, perturb = false)),
      (3L, Multimodal.syntheticPng(200L, perturb = false)))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.imagePhashNearDupPairs(trio, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
