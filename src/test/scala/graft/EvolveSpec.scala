package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Evolve

class EvolveSpec extends SparkSpecBase {
  import spark.implicits._

  test("widen: lossless numeric promotions only") {
    assert(Evolve.widen(IntegerType, LongType).contains(LongType))
    assert(Evolve.widen(ByteType, ShortType).contains(ShortType))
    assert(Evolve.widen(FloatType, DoubleType).contains(DoubleType))
    assert(Evolve.widen(StringType, StringType).contains(StringType))
    assert(Evolve.widen(StringType, LongType).isEmpty)
    assert(Evolve.widen(DoubleType, LongType).isEmpty)
  }

  test("mergeSchemas: first-seen column order, widening, loud conflict") {
    val v1 = StructType(Seq(StructField("id", IntegerType),
      StructField("a", StringType)))
    val v2 = StructType(Seq(StructField("id", LongType),
      StructField("b", DoubleType)))
    val m = Evolve.mergeSchemas(Seq(v1, v2))
    assert(m.fieldNames.toSeq == Seq("id", "a", "b"))
    assert(m("id").dataType == LongType)
    assert(m.forall(_.nullable))
    val bad = StructType(Seq(StructField("id", StringType)))
    val e = intercept[IllegalArgumentException](
      Evolve.mergeSchemas(Seq(v1, bad)))
    assert(e.getMessage.contains("irreconcilable"))
  }

  test("readParquet: three producer eras serve one normalized frame") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-evolve").toString
    // era 1: narrow int ids, no 'note' column yet
    Seq((1, "a"), (2, "b")).toDF("id", "name")
      .write.parquet(s"$dir/v1")
    // era 2: ids widened, 'note' present under a legacy name
    Seq((3L, "c", "n3")).toDF("id", "name", "note_txt")
      .write.parquet(s"$dir/v2")
    // era 3: canonical
    Seq((4L, "d", "n4")).toDF("id", "name", "note")
      .write.parquet(s"$dir/v3")
    val got = Evolve.readParquet(spark, dir,
      renames = Map("note_txt" -> "note"))
    assert(got.schema("id").dataType == LongType)
    assert(got.columns.sorted.toSeq == Seq("id", "name", "note"))
    val rows = got.orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some("n3")), (4L, "d", Some("n4"))))
  }

  test("readParquet skips hidden dirs and swap debris, keeps hive partitions") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-evolve-hidden").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/live")
    // hive-partitioned data under an underscore partition name is DATA
    Seq((2L, "b")).toDF("id", "name").write.parquet(s"$dir/_day=19000")
    // maintenance debris normal Spark reads ignore — stale copies that
    // must NOT be double-read
    Seq((99L, "stale")).toDF("id", "name")
      .write.parquet(s"$dir/_old_purge__day=19000")
    Seq((98L, "stale")).toDF("id", "name")
      .write.parquet(s"$dir/_compact_tmp__day=19000")
    Seq((97L, "stale")).toDF("id", "name").write.parquet(s"$dir/.staging")
    Seq((96L, "stale")).toDF("id", "name").write.parquet(s"$dir/_tmp")
    val got = Evolve.readParquet(spark, dir)
    assert(got.select($"id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
  }
}
