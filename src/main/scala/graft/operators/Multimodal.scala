package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
