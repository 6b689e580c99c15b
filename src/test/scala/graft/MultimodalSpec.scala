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
}
