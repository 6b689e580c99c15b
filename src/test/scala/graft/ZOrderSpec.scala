package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpecBase {

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zvalue matches a reference interleave; quantize is monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pts.map { case (x, y) => mortonRef(x, y, 16) })

    val qs = (0L to 1000L).toDF("v")
      .select(ZOrder.quantize(col("v"), 0L, 1000L, 8).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(qs.head == 0L && qs.last == 255L)
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b }, "not monotone")
    // clamping
    val cl = Seq(-5L, 2000L).toDF("v")
      .select(ZOrder.quantize(col("v"), 0L, 1000L, 8).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(cl == Seq(0L, 255L))
  }

  test("a thin slice on EITHER dimension skips most z-clustered files") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(40000)((rnd.nextInt(10000).toLong, rnd.nextInt(10000).toLong))
    val df = rows.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    // comparison layout: range-clustered on x only
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$dir/linear")
    ZOrder.writeClustered(df, s"$dir/z", col("x"), col("y"),
      (0L, 9999L), (0L, 9999L), bits = 14, numFiles = 16)

    def filesHit(path: String, c: String): Int = {
      val d = spark.read.parquet(path)
        .filter(col(c) >= 4000 && col(c) < 4600)
      d.count() // materialize
      d.select(input_file_name()).distinct().count().toInt
    }
    // y-slice: the x-sorted layout reads everything, z reads a fraction
    val linY = filesHit(s"$dir/linear", "y")
    val zY = filesHit(s"$dir/z", "y")
    assert(linY == 16, s"x-sorted layout should hit all files, hit $linY")
    assert(zY <= 8, s"z layout should skip most files on y, hit $zY")
    // x-slice: z still prunes (both dims share the key's bits)
    val zX = filesHit(s"$dir/z", "x")
    assert(zX <= 8, s"z layout should skip most files on x, hit $zX")
  }

  test("clustered store holds exactly the input rows") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i % 97, i % 89)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder2").toString
    ZOrder.writeClustered(df, s"$dir/z", col("x"), col("y"),
      (0L, 96L), (0L, 88L), bits = 7, numFiles = 4)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == 5000)
    assert(back.groupBy("x", "y").count()
      .except(df.groupBy("x", "y").count()).count() == 0)
  }
}
