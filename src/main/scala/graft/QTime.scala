package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration (not part of the
  * driver contract; Bench is the reported benchmark). */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q59_bm25", "q64_tfidf_ann")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      names.foreach { n =>
        println(s"==== $n")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }
    names.foreach { n =>  // warm
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n%-24s ${ts.min}%.2f s")
    }
    spark.stop()
  }
}
