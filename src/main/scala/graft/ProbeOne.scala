package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused probe runner for optimization work: re-runs ONE BenchScale
  * probe family (or one Bench gate) without paying the full sweep —
  * `sbt "runMain graft.ProbeOne release"` runs the delta-release
  * probes at 1× and 10× and prints their ratio. Measurement-only
  * tooling; never part of the driver contract. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bigPath = s"$tmp/graft_probe10x_docs"
    if (!new java.io.File(bigPath + "/_SUCCESS").exists()) {
      (0 until 10).map { c =>
        docs.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          (if (c % 2 == 1) concat(col("text"), lit(s" variantmark$c"))
           else col("text")).as("text"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(bigPath)
    }
    val big = spark.read.parquet(bigPath)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // mirrors BenchScale.releaseProbes exactly
    def releaseProbes(d: DataFrame, mult: Int,
                      tag: String): Seq[(String, Double)] = {
      import graft.operators.Pipeline
      val path = s"$tmp/graft_probe_${tag}_rel"
      val src = d.select(col("doc_id"), col("text"),
        lit("en").as("lang"),
        length(col("text")).cast("double").as("sc"),
        concat(lit("s"), pmod(col("doc_id"), lit(7))).as("dom"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val params = Pipeline.ReleaseParams(minQuality = 0.0,
        maxTokens = 100000, maxDupTokenFrac = 1.0,
        maxTopBigramFrac = 1.0)
      val tInit = time(Pipeline.releaseInit(src, col("doc_id"),
        col("text"), col("lang"), col("sc"), col("dom"), bench,
        col("doc_id"), col("text"), path, params = params,
        nBuckets = 64 * mult))
      val batch = src.filter(col("doc_id") % 41 === 0).limit(5)
        .withColumn("text", concat(col("text"), lit(" deltamark")))
      val tDelta = time { Pipeline.releaseDelta(spark, path, batch,
        col("doc_id"), col("text"), col("lang"), col("sc"),
        col("dom"), bench, col("doc_id"), col("text")); () }
      Seq("release_init" -> tInit, "release_delta" -> tDelta)
    }

    args.headOption.getOrElse("release") match {
      case "release" =>
        val base = releaseProbes(docs, 1, "base")
        val big10 = releaseProbes(big, 10, "10x")
        base.zip(big10).foreach { case ((n, b), (_, g)) =>
          println(f"[probe] $n base=$b%.1f s  10x=$g%.1f s  ratio=${g / b}%.2f")
        }
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
