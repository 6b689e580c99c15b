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
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // mirror Bench's committer-v2 posture so probes measure what the
    // bench pays; SPARK_GRAFT_COMMITTER_V1=1 flips back for A/B runs
    val b = if (sys.env.contains("SPARK_GRAFT_COMMITTER_V1")) b0
    else b0.config(
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
      "2")
    val spark = b.getOrCreate()
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

    def phase(name: String)(f: => Unit): Unit =
      println(f"[probe] $name ${time(f)}%.2f s")

    // optional per-job trace: SPARK_GRAFT_PROBE_JOBS=1
    if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = Option(starts.remove(j.jobId)).getOrElse(0L)
            println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
          }
        })
    }

    args.headOption.getOrElse("release") match {
      case "release" =>
        val base = releaseProbes(docs, 1, "base")
        val big10 = releaseProbes(big, 10, "10x")
        base.zip(big10).foreach { case ((n, b), (_, g)) =>
          println(f"[probe] $n base=$b%.1f s  10x=$g%.1f s  ratio=${g / b}%.2f")
        }

      // decomposes q95's drive: staging + build + 3 upserts + serve,
      // WITHOUT the streaming machinery (its cost = the scheduler gap)
      case "q95" =>
        import graft.operators.TextSearch
        import org.apache.spark.sql.expressions.Window
        val sample = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), col("text"))
        val chunked = sample.withColumn("_c",
          ntile(4).over(Window.orderBy(col("doc_id")))).localCheckpoint()
        def chunk(i: Int) = chunked.filter(col("_c") === i).drop("_c")
        val idx = tmp + "/probe_q95_idx"
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(idx), true)
        phase("q95.build(c1)") {
          TextSearch.buildTextIndex(chunk(1), col("doc_id"), col("text"),
            idx, seq = 1L)
        }
        (2 to 4).foreach { i =>
          phase(s"q95.upsert(c$i)") {
            TextSearch.upsertTextDocs(spark, idx, chunk(i),
              col("doc_id"), col("text"), newSeq = i.toLong)
          }
        }
        phase("q95.serve") {
          TextSearch.searchIndexed(spark, idx,
            Seq("hash", "join", "stream"), 20)
            .write.format("noop").mode("overwrite").save()
        }

      // decomposes q187: createTarget + 4 syncBatch deltas
      case "q187" =>
        import graft.operators.Replication
        val c = col("doc_id") % 5
        def h(pos: Long, br: String) =
          md5(concat(col("doc_id").cast("string"), lit(s":$pos:$br")))
        def rv(pos: Long, br: String) = concat(lit(s"$pos-"), h(pos, br))
        val ids = docs.select(col("doc_id"))
        val src = ids.select(col("doc_id").as("id"),
          when(c === 3, 1L).otherwise(2L).as("rev_pos"),
          when(c === 1, h(2, "s")).when(c === 4, h(2, "d"))
            .when(c === 3, h(1, "m")).otherwise(h(2, "m")).as("rev_hash"),
          (c === 4).as("deleted"),
          when(c === 3, array().cast("array<string>"))
            .otherwise(array(rv(1, "m"))).as("ancestors"))
        val tgt = ids.filter(c =!= 3).select(col("doc_id").as("id"),
          when(c === 2, 3L).when(c === 1, 2L).otherwise(1L).as("rev_pos"),
          when(c === 2, h(3, "m")).when(c === 1, h(2, "t"))
            .otherwise(h(1, "m")).as("rev_hash"),
          lit(false).as("deleted"),
          when(c === 2, array(rv(2, "m"), rv(1, "m")))
            .when(c === 1, array(rv(1, "m")))
            .otherwise(array().cast("array<string>")).as("ancestors"))
        val path = tmp + "/probe_q187_tgt"
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(path), true)
        phase("q187.createTarget") {
          Replication.createTarget(spark, path, tgt, col("id"),
            col("rev_pos"), col("rev_hash"), col("deleted"),
            col("ancestors"), numBuckets = 16)
        }
        val nDocs = ids.count()
        (0 until 4).foreach { i =>
          phase(s"q187.syncBatch($i)") {
            Replication.syncBatch(spark, path, src, col("id"),
              col("rev_pos"), col("rev_hash"), col("deleted"),
              col("ancestors"),
              ids.filter(col("doc_id") % 4 === i).select(
                col("doc_id").as("id")),
              numBuckets = 16, newSeq = i + 1L)
          }
        }
        phase("q187.serve") {
          Replication.openTarget(spark, path)
            .write.format("noop").mode("overwrite").save()
        }

      // decomposes q180: index open + every page of the descending
      // indexed bookmark walk
      case "q180" =>
        import graft.operators.Mango
        val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        val path = tmp + "/probe_q180_idx"
        val idx =
          if (graft.view.IndexStore.exists(spark, path))
            Mango.openIndex(spark, path)
          else Mango.createIndex(spark, orders, "o_orderkey",
            Seq("o_totalprice"), path, numBuckets = 8)
        val req = """{"selector": {"o_totalprice": {"$gte": 280000},
          | "o_orderpriority": {"$regex": "^[1-3]-"}},
          | "fields": ["o_orderkey", "o_orderpriority", "o_totalprice"],
          | "sort": [{"o_totalprice": "desc"}], "limit": 800}""".stripMargin
        var bm: Option[String] = None
        var done = false
        var pageN = 0
        while (!done) {
          phase(s"q180.page$pageN") {
            val (_, nb) = Mango.findPageAuto(spark, orders,
              "o_orderkey", Seq(idx), req, bm)
            bm = nb
            done = nb.isEmpty
          }
          pageN += 1
        }

      // decomposes q101: staging + LSH build + upsert + serve
      case "q101" =>
        import graft.operators.Similarity
        import org.apache.spark.sql.expressions.Window
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val chunked = emb.withColumn("_c",
          ntile(2).over(Window.orderBy(col("vec_id")))).localCheckpoint()
        def chunk(i: Int) = chunked.filter(col("_c") === i).drop("_c")
        val idx = tmp + "/probe_q101_idx"
        // two passes: pass 1 pays JVM/codegen warm-up, pass 2 is the
        // steady-state cost of the layout itself
        (1 to 2).foreach { p =>
          org.apache.hadoop.fs.FileSystem.getLocal(
            spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(idx), true)
          phase(s"q101.build(c1)#$p") {
            Similarity.buildLshIndex(chunk(1), idx, seq = 1L)
          }
          phase(s"q101.upsert(c2)#$p") {
            Similarity.upsertLshVectors(spark, idx, chunk(2), newSeq = 2L)
          }
          phase(s"q101.serve#$p") {
            Similarity.lshTopKIndexed(spark, idx,
              emb.filter(col("vec_id") < 10), 5)
              .write.format("noop").mode("overwrite").save()
          }
        }

      // dump explain("formatted") for the given gates into
      // SPARK_GRAFT_PLANS_DIR with the SPARK_GRAFT_PLANS_TAG suffix —
      // the judge-readable plan evidence (plans/r16/<q>_<tag>.txt)
      case "plans" =>
        val keys = args(1).split(",").toSet
        val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
          "plans/r16")
        val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "after")
        new java.io.File(outDir).mkdirs()
        SparkEntry.queries.filter { case (k, _) => keys(k) }
          .foreach { case (k, fn) =>
            val txt =
              try fn(spark, sfDir).queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode
                  .fromString("formatted"))
              catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
            val w = new java.io.PrintWriter(s"$outDir/${k}_$tag.txt",
              "UTF-8")
            try w.println(txt) finally w.close()
            println(s"[probe] plans: $k -> $outDir/${k}_$tag.txt")
          }

      // dump the SINGLE-PAGE fetch plan of the q180-shaped indexed
      // bookmark walk (the per-request plan the gate-level dump hides
      // behind the stitched union of local page rows)
      case "pageplan" =>
        import graft.operators.Mango
        val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR",
          "plans/r16")
        val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "after")
        new java.io.File(outDir).mkdirs()
        val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        val path = tmp + "/probe_q180_pageplan_idx"
        val idx =
          if (graft.view.IndexStore.exists(spark, path))
            Mango.openIndex(spark, path)
          else Mango.createIndex(spark, orders, "o_orderkey",
            Seq("o_totalprice"), path, numBuckets = 8)
        val req = """{"selector": {"o_totalprice": {"$gte": 280000},
          | "o_orderpriority": {"$regex": "^[1-3]-"}},
          | "fields": ["o_orderkey", "o_orderpriority", "o_totalprice"],
          | "sort": [{"o_totalprice": "desc"}], "limit": 800}""".stripMargin
        val Some((fetch, _, _, pageSize)) =
          Mango.pagePlanIndexed(spark, orders, "o_orderkey", idx, req,
            bookmark = None)
        val txt = fetch.limit(pageSize + 1).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        val w = new java.io.PrintWriter(
          s"$outDir/q180_page_fetch_$tag.txt", "UTF-8")
        try w.println(txt) finally w.close()
        println(s"[probe] pageplan -> $outDir/q180_page_fetch_$tag.txt")

      // A/B the PQ serving tiers on the q118 shape: literal-codebook
      // expressions (36 KB plan, per-query Catalyst+codegen tax) vs
      // the broadcast tier (tiny plan, same results — bit-identity is
      // spec-pinned in PqSpec). Decides whether q118's cost is
      // planning or execution.
      case "q118ab" =>
        import graft.operators.Pq
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        def serve(): Unit =
          Pq.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
            m = 8, ks = 16, refine = 50)
            .orderBy(col("q_id"), col("rank"))
            .write.format("noop").mode("overwrite").save()
        (1 to 3).foreach(i => phase(s"q118.literal#$i")(serve()))
        val saved = Pq.literalCodebookMax
        try {
          Pq.literalCodebookMax = 1
          (1 to 3).foreach(i => phase(s"q118.broadcast#$i")(serve()))
        } finally Pq.literalCodebookMax = saved

      // per-ROW cost of the two PQ tiers at 100x the gate corpus:
      // decides whether the broadcast tier's win is local-only (plan
      // tax) or holds when execution dominates (the 100 TB question)
      case "q118rows" =>
        import graft.operators.Pq
        val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val big = (0 until 100).map(c => emb1.select(
            (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _).localCheckpoint()
        println(s"[probe] rows=${big.count()}")
        val cbs = Pq.initCodebooks(emb1, m = 8, ks = 16)
        def enc(): Unit = Pq.encode(big, cbs)
          .write.format("noop").mode("overwrite").save()
        val codes = Pq.encode(big, cbs).localCheckpoint()
        def adc(): Unit = Pq.adcTopK(codes, big,
            big.filter(col("vec_id") < 10), cbs, k = 5, refine = 50)
          .write.format("noop").mode("overwrite").save()
        (1 to 2).foreach(i => phase(s"encode.literal#$i")(enc()))
        (1 to 2).foreach(i => phase(s"adc.literal#$i")(adc()))
        val saved = Pq.literalCodebookMax
        try {
          Pq.literalCodebookMax = 1
          (1 to 2).foreach(i => phase(s"encode.broadcast#$i")(enc()))
          (1 to 2).foreach(i => phase(s"adc.broadcast#$i")(adc()))
        } finally Pq.literalCodebookMax = saved

      // per-ROW cost of the IVF centroid-assignment tiers at 100x —
      // the Similarity analogue of q118rows (16 centroids × 64 dims
      // literal top-1 sort vs the compiled broadcast argmax)
      case "ivfrows" =>
        import graft.operators.Similarity
        val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val big = (0 until 100).map(c => emb1.select(
            (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _).localCheckpoint()
        println(s"[probe] rows=${big.count()}")
        def assign(): Unit = Similarity.clusterAssignProbe(big)
          .write.format("noop").mode("overwrite").save()
        (1 to 2).foreach(i => phase(s"ivfassign.literal#$i")(assign()))
        val saved = Similarity.literalCentroidMax
        try {
          Similarity.literalCentroidMax = 0
          (1 to 2).foreach(i => phase(s"ivfassign.broadcast#$i")(assign()))
        } finally Similarity.literalCentroidMax = saved

      // re-run the one-time index-build phase exactly as Bench does
      // (same pool, same prereq chaining) and print per-build walls +
      // the phase wall — the r16 driver tails showed the 32-core build
      // phase 10x slower per build than the 8-core leg; this isolates
      // that measurement from the 25-minute full sweep. Optional
      // second arg = comma-separated build keys.
      case "builds" =>
        val keys = args.drop(1).headOption.map(_.split(",").toSet)
        val fns = keys match {
          case Some(ks) => SparkEntry.indexBuilds.filter {
            case (k, _) => ks(k) }
          case None => SparkEntry.indexBuilds
        }
        val buildThreads = math.max(1,
          sys.env.getOrElse("SPARK_GRAFT_BUILD_THREADS", "4").toInt)
        def runBuild(name: String,
                     fn: (SparkSession, String) => Unit): Double = {
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir); true }
                   catch { case e: Throwable =>
                     println(s"[build-FAIL] $name: ${e.getMessage}")
                     false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val t0 = System.nanoTime()
        val builds: Map[String, Double] =
          if (buildThreads <= 1 || fns.size <= 1)
            fns.map { case (n, fn) => n -> runBuild(n, fn) }.toMap
          else {
            import java.util.concurrent.{CompletableFuture, Executors}
            val pool = Executors.newFixedThreadPool(buildThreads)
            try {
              val cfs = scala.collection.mutable
                .Map[String, CompletableFuture[java.lang.Double]]()
              def cfFor(name: String): CompletableFuture[java.lang.Double] =
                cfs.getOrElseUpdate(name, {
                  val deps = SparkEntry.buildPrereqs.getOrElse(name, Nil)
                    .filter(fns.contains).map(cfFor)
                  CompletableFuture.allOf(deps: _*).thenApplyAsync(
                    _ => java.lang.Double.valueOf(
                      runBuild(name, fns(name))),
                    pool)
                })
              fns.keys.foreach(cfFor)
              fns.keys.map(n => n -> cfs(n).join().doubleValue()).toMap
            } finally pool.shutdown()
          }
        builds.toSeq.sortBy(-_._2).foreach { case (n, t) =>
          println(f"[build] $n $t%8.2f s")
        }
        println(f"[build] WALL ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(cpus=$cpus threads=$buildThreads)")

      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
