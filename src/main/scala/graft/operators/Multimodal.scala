package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus batch-shaped
  * decode / feature-extraction over `mapPartitions`.
  *
  * The DECODE step is a clearly marked deterministic STUB (this
  * environment has no image/audio codecs); everything around it —
  * schema, partitioning, the per-partition batch loop, the feature
  * struct — is the real plumbing a production decoder drops into.
  */
object Multimodal {

  /** Metadata schema carried next to every payload. */
  val metadataType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Build an asset table from the documents table: payload = UTF-8 bytes
    * of the text (deterministic fake for a real image/audio blob), typed
    * metadata derived from it. Pure builtin functions. */
  def assetsFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (pmod(col("doc_id"), lit(64)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 24).cast("int").as("height")
      ).as("meta"))

  /** Output row of [[extractFeatures]]. */
  case class AssetFeatures(doc_id: Long, n_bytes: Long, head_hex: String,
                           byte_sum: Long)

  /** Batch-shaped feature extraction over payload bytes via
    * `mapPartitions`: one iterator pass per partition, the shape a real
    * decoder (JNI codec, ONNX session, …) needs — init once per
    * partition, stream the rows through.
    *
    * ==== STUB ====
    * A production implementation decodes `payload` with an image/audio
    * library here. This environment has none, so the "features" are a
    * deterministic function of the raw bytes (length, head bytes, byte
    * sum) — the Spark-side plumbing (schema, encoders, partition batch
    * loop) is real and tested.
    */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (decoder handle, model session)
        it.map { case (id, bytes) =>
          val head = bytes.take(8).map(b => f"$b%02X").mkString
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
          AssetFeatures(id, bytes.length.toLong, head, sum)
        }
      }
  }

  /** Byte values (0-255) of a binary column, as `array<long>`. */
  def byteValues(payload: Column): Column =
    transform(sequence(lit(1), greatest(octet_length(payload), lit(1))),
      i => conv(hex(payload.substr(i, lit(1))), 16, 10).cast("long"))

  /** Pooling over an ALREADY-projected byte array. NOTE: the Column
    * formulations below are the oracle-replayable REFERENCE (and the
    * cross-check in the spec); [[phashNearDupPairs]] hashes with a
    * compiled per-row loop instead, because higher-order functions are
    * interpreted and RE-EVALUATE nested subtrees per element — the
    * composed pixel→bit→band chain costs O(64·n) per stage
    * multiplicatively (found the hard way: it hung on 500 rows). */
  def pooledPixelsFromBytes(bytes: Column, n: Column): Column =
    transform(sequence(lit(0), lit(63)), j => {
      val lo = floor(j.cast("double") * n / 64).cast("long")
      val hi = floor((j + 1).cast("double") * n / 64).cast("long")
      val cnt = greatest(hi - lo, lit(1L))
      floor(aggregate(
          slice(bytes, (lo + 1).cast("int"), cnt.cast("int")),
          lit(0L), (a, x) => a + x).cast("double") / cnt).cast("int")
    })

  /** 64 average-pooled "pixels" of the payload — the stand-in for
    * resize-to-8×8 grayscale: byte bucket j of 64 equal spans averaged
    * with floor divisions, all INTEGER-exact arithmetic so the
    * thumbnail replays bit-for-bit in any engine. A production
    * pipeline drops the real decoder's 8×8 grayscale here (pooling a
    * decoded thumbnail is O(64), not O(payload)). Payloads shorter
    * than 64 bytes have empty buckets (pixel 0) — callers gate on
    * `octet_length >= 64`. */
  def pooledPixels(payload: Column): Column =
    pooledPixelsFromBytes(byteValues(payload), octet_length(payload))

  /** aHash bit vector (64 × 0/1): bit j set when pixel j exceeds the
    * floor-mean of the 64 pixels — the classic average hash. */
  def aHashBits(pixels: Column): Column = {
    val mean = floor(aggregate(pixels, lit(0L), (a, x) => a + x)
      .cast("double") / 64).cast("int")
    transform(pixels, p => when(p > mean, 1).otherwise(0))
  }

  /** dHash bit vector (64 × 0/1): bit j set when pixel j is darker
    * than its right neighbor (cyclic) — the gradient/difference hash,
    * more robust than aHash to global brightness shifts. */
  def dHashBits(pixels: Column): Column =
    transform(pixels, (p, i) =>
      when(p < element_at(pixels, pmod(i + 1, lit(64)) + 1), 1)
        .otherwise(0))

  /** 4 × 16-bit band values of a 64-bit hash — the SimHash banding
    * trick: two hashes within hamming distance 3 share at least one
    * intact band, so band-equality buckets bound the candidate join
    * (no all-pairs anywhere). */
  def hashBands(bits: Column): Column =
    transform(sequence(lit(0), lit(3)), b =>
      aggregate(
        zip_with(slice(bits, b * 16 + 1, lit(16)), sequence(lit(0), lit(15)),
          (bit, k) => bit.cast("long") * pow(lit(2.0), k).cast("long")),
        lit(0L), (a, x) => a + x))

  /** Hash output row: 64 bit values + 4 16-bit band values. */
  case class Phash(bits: Array[Int], bands: Array[Long])

  /** Pixels → hash bits → bands: the shared integer arithmetic behind
    * both the raw-byte and the decoded-image hash paths (exactly the
    * [[aHashBits]]/[[dHashBits]]/[[hashBands]] Column reference,
    * spec-pinned equal). */
  private def hashPixels(px: Array[Long], method: String): Phash = {
    val mean = px.sum / 64
    val bits = new Array[Int](64)
    var j = 0
    if (method == "ahash")
      while (j < 64) { bits(j) = if (px(j) > mean) 1 else 0; j += 1 }
    else
      while (j < 64) {
        bits(j) = if (px(j) < px((j + 1) % 64)) 1 else 0; j += 1
      }
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var v = 0L
      var k = 0
      while (k < 16) { v |= bits(b * 16 + k).toLong << k; k += 1 }
      bands(b) = v
      b += 1
    }
    Phash(bits, bands)
  }

  /** One compiled O(payload) pass computing pooled pixels → hash bits
    * → bands — exactly the [[pooledPixelsFromBytes]]/[[aHashBits]]/
    * [[dHashBits]]/[[hashBands]] arithmetic (integer floor divisions;
    * spec-pinned equal), zero shuffle, no interpreted per-element
    * re-evaluation. */
  private def phash64(method: String) =
    udf((payload: Array[Byte]) =>
      if (payload == null || payload.length < 64) None
      else {
        val n = payload.length
        val px = new Array[Long](64)
        var j = 0
        while (j < 64) {
          val lo = j.toLong * n / 64
          val hi = (j + 1).toLong * n / 64
          var s = 0L
          var i = lo
          while (i < hi) { s += payload(i.toInt) & 0xff; i += 1 }
          px(j) = s / math.max(hi - lo, 1L)
          j += 1
        }
        Some(hashPixels(px, method))
      })

  /** `(doc_id, bits, bands)` perceptual hashes of every payload with
    * at least 64 bytes — the compiled hash pass behind
    * [[phashNearDupPairs]], exposed for index builds and specs. */
  def phashes(assets: DataFrame, method: String = "ahash"): DataFrame = {
    require(method == "ahash" || method == "dhash",
      s"method must be ahash|dhash, got $method")
    assets.filter(octet_length(col("payload")) >= 64)
      .select(col("doc_id").cast("long").as("doc_id"),
        phash64(method)(col("payload")).as("_h"))
      .select(col("doc_id"), col("_h.bits").as("bits"),
        col("_h.bands").as("bands"))
  }

  /** PERCEPTUAL-HASH image near-dup (`method` = "ahash" | "dhash"):
    * the image-column analogue of SimHash text dedup. Each asset's
    * payload is pooled to the 64-pixel thumbnail, hashed, banded; the
    * candidate join runs ONLY within equal (band, value) buckets and
    * survivors are verified by exact hamming distance ≤ `maxHamming`.
    * Returns `(doc_a, doc_b, hamming)`, doc_a < doc_b. All arithmetic
    * is integer-exact → full oracle replay (gate q114). Bucket-bounded
    * like every graft dedup: cost tracks band-bucket sizes, never
    * corpus². */
  def phashNearDupPairs(assets: DataFrame, maxHamming: Int = 10,
                        method: String = "ahash"): DataFrame =
    bandedPairs(phashes(assets, method), maxHamming)

  /** The banded candidate join + exact hamming verify over a
    * `(doc_id, bits, bands)` hash table — shared by the raw-byte and
    * decoded-image hash paths. Bucket-bounded: cost tracks band-bucket
    * sizes, never corpus². */
  private[graft] def bandedPairs(h: DataFrame, maxHamming: Int): DataFrame = {
    val bandRows = h.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "v")))
    val cand = bandRows.select(col("band"), col("v"),
        col("doc_id").as("doc_a"))
      .join(bandRows.select(col("band"), col("v"),
        col("doc_id").as("doc_b")), Seq("band", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(h.select(col("doc_id").as("doc_a"), col("bits").as("ba")),
        Seq("doc_a"))
      .join(h.select(col("doc_id").as("doc_b"), col("bits").as("bb")),
        Seq("doc_b"))
      .withColumn("hamming", aggregate(
        zip_with(col("ba"), col("bb"),
          (x, y) => when(x =!= y, 1L).otherwise(0L)),
        lit(0L), (a, x) => a + x))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ----------------------------------------------------- real image decode

  /** REAL pure-JVM image decode (javax.imageio — PNG/BMP/GIF readers
    * ship in every JRE): payload → the 8×8 grayscale thumbnail, by
    * integer block-average pooling over the decoded raster. This is
    * the production path the [[pooledPixels]] byte-pooling stub stands
    * in for; both feed the same [[hashPixels]] arithmetic.
    *
    * Exactness contract (what makes the q162 oracle replay possible):
    * single-band (grayscale) images read their raster samples
    * DIRECTLY — no colorspace conversion, so a gray PNG round-trips
    * bit-exact; RGB images reduce per pixel by the integer ITU-R 601
    * luma `(299r + 587g + 114b) / 1000`. Cell (row j, col i) of the
    * thumbnail averages the pixel block `y ∈ [jh/8, (j+1)h/8) × x ∈
    * [iw/8, (i+1)w/8)` with floor division — the [[pooledPixels]]
    * span rule in two dimensions. Returns None for undecodable
    * payloads or images smaller than 8×8 (the quarantine rule:
    * undecodable assets drop out of the hash relation, countable by
    * anti-join). */
  private[graft] def decodeGray64(payload: Array[Byte]): Option[Array[Long]] =
    decodeGray64Dims(payload).map(_._1)

  /** [[decodeGray64]] plus the decoded dimensions — ONE ImageIO.read
    * per payload for consumers that need both (decode dominates the
    * per-row cost; see [[decodeFeatures]]). */
  private[graft] def decodeGray64Dims(payload: Array[Byte])
      : Option[(Array[Long], Int, Int)] =
    try {
      if (payload == null) return None
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val grayDirect = raster.getNumBands == 1
        val px = new Array[Long](64)
        var idx = 0
        var j = 0
        while (j < 8) {
          val y0 = j * h / 8; val y1 = (j + 1) * h / 8
          var i = 0
          while (i < 8) {
            val x0 = i * w / 8; val x1 = (i + 1) * w / 8
            var s = 0L
            var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val g =
                  if (grayDirect) raster.getSample(x, y, 0)
                  else {
                    val rgb = img.getRGB(x, y)
                    ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                      (rgb & 0xff) * 114) / 1000
                  }
                s += g; cnt += 1; x += 1
              }
              y += 1
            }
            px(idx) = s / math.max(cnt, 1L)
            idx += 1; i += 1
          }
          j += 1
        }
        Some((px, w, h))
      }
    } catch { case _: Exception => None }

  /** `(doc_id, bits, bands)` perceptual hashes over DECODED images —
    * [[phashes]] with the real decoder in front: decode → 8×8
    * thumbnail → the same bits/bands arithmetic. Undecodable payloads
    * drop out (compare counts against the asset table to quarantine). */
  def imagePhashes(assets: DataFrame, method: String = "ahash"): DataFrame = {
    require(method == "ahash" || method == "dhash",
      s"method must be ahash|dhash, got $method")
    val f = udf((payload: Array[Byte]) =>
      decodeGray64(payload).map(px => hashPixels(px, method)))
    assets
      .select(col("doc_id").cast("long").as("doc_id"),
        f(col("payload")).as("_h"))
      .filter(col("_h").isNotNull)
      .select(col("doc_id"), col("_h.bits").as("bits"),
        col("_h.bands").as("bands"))
  }

  /** Perceptual-hash near-dup over DECODED images (gate q162) — the
    * q114 pipeline with real decode replacing byte pooling. The hash
    * relation is materialized once (`localCheckpoint`): [[bandedPairs]]
    * consumes it from FOUR join branches, and without the barrier each
    * branch would re-run the decoder — 4× the dominant cost. The
    * stored rows are 64 ints + 4 longs per asset, negligible next to
    * the payloads they summarize. */
  def imagePhashNearDupPairs(assets: DataFrame, maxHamming: Int = 10,
                             method: String = "ahash"): DataFrame =
    bandedPairs(imagePhashes(assets, method).localCheckpoint(), maxHamming)

  /** Output row of [[decodeFeatures]]. */
  case class DecodedFeatures(doc_id: Long, n_bytes: Long, decoded: Boolean,
                             width: Int, height: Int, gray_mean: Long)

  /** The REAL-decoder form of [[extractFeatures]]: same `mapPartitions`
    * batch shape (init-once-per-partition slot, rows streamed through),
    * javax.imageio decode in the loop. Undecodable payloads keep their
    * row with `decoded = false` — feature extraction quarantines, it
    * does not drop. */
  def decodeFeatures(assets: DataFrame): Dataset[DecodedFeatures] = {
    import assets.sparkSession.implicits._
    assets.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (ImageIO plugin scan is
        // per-JVM; a JNI codec or ONNX session would init here)
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          decodeGray64Dims(bytes) match {
            case Some((px, w, h)) =>
              DecodedFeatures(id, n, decoded = true, w, h, px.sum / 64)
            case None =>
              DecodedFeatures(id, n, decoded = false, 0, 0, 0L)
          }
        }
      }
  }

  /** Deterministic synthetic image: a `w×h` grayscale PNG whose pixel
    * `(x, y)` is `min(255, (seed·31 + 7x + 13y) mod 256 + (perturb
    * when (x+y) mod 9 = 0 then 2 else 0))` — an analytically-known
    * raster, so decode correctness is gated end-to-end (a wrong
    * decoder produces pixels that disagree with the formula the q162
    * oracle computes). Written through the raster (no colorspace
    * transform), PNG is lossless: decode must return these exact
    * values. */
  def syntheticPng(seed: Long, perturb: Boolean, w: Int = 16,
                   h: Int = 16): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      syntheticImage(seed, perturb, w, h), "png", bos)
    bos.toByteArray
  }

  /** The [[syntheticPng]] raster as a JPEG — the format real crawl
    * image corpora overwhelmingly arrive in (the JDK ships a JPEG
    * reader/writer, so decode needs no new machinery). JPEG is LOSSY:
    * individual pixels do not round-trip, so gates verify dimensions
    * exactly and the pooled gray mean within a tolerance (DC
    * components survive quantization; the q267 verdict relation
    * states the tolerance check, not pixel equality). */
  def syntheticJpeg(seed: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      syntheticImage(seed, perturb = false, w, h), "jpg", bos)
    bos.toByteArray
  }

  /** The analytically-known grayscale raster both writers share:
    * pixel `(x, y) = min(255, (seed·31 + 7x + 13y) mod 256
    * (+2 on the perturb diagonal))`. */
  private def syntheticImage(seed: Long, perturb: Boolean, w: Int,
                             h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        val g = math.min(255,
          base + (if (perturb && (x + y) % 9 == 0) 2 else 0))
        raster.setSample(x, y, 0, g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** The exact pooled-thumbnail gray mean of the [[syntheticImage]]
    * raster — [[decodeGray64Dims]]'s block-average + `sum/64`
    * arithmetic replayed analytically, the PNG-exact / JPEG-tolerance
    * reference the q267 verdict compares against. */
  def syntheticGrayMean(seed: Long, w: Int, h: Int): Long = {
    val px = new Array[Long](64)
    var idx = 0
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8; val y1 = (j + 1) * h / 8
      var i = 0
      while (i < 8) {
        val x0 = i * w / 8; val x1 = (i + 1) * w / 8
        var s = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            s += ((seed * 31 + x * 7 + y * 13) % 256).toInt
            cnt += 1; x += 1
          }
          y += 1
        }
        px(idx) = s / math.max(cnt, 1L); idx += 1; i += 1
      }
      j += 1
    }
    px.sum / 64
  }

  /** "Frame sampling": every `stride`-th fixed-size slice of the payload
    * (stand-in for video frame extraction), as an array of binary frames.
    * Pure builtins — `substring` on binary stays in codegen. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 16,
                   stride: Int = 4): DataFrame = {
    val nFrames = greatest(
      floor(octet_length(col("payload")) / (frameBytes * stride)), lit(0L))
      .cast("int")
    assets.withColumn("frames",
      transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => col("payload").substr(i * (frameBytes * stride) + 1,
          lit(frameBytes))))
  }
}
