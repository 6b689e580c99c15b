package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-validation sidecar: times the heaviest document pipelines at
  * the base SF and at a synthetic 10× replication of the same corpus,
  * and reports the scale RATIOS — the guard against operators whose
  * cost is accidentally superlinear (a hazard invisible at any single
  * SF; round 4 shipped two such, both caught only by code audit).
  *
  * The 10× corpus is BENCH-ONLY: ids are offset per copy and odd
  * copies get a one-token perturbation (so the duplicate population
  * grows 5× instead of trivially 10×); correctness stays gated on the
  * driver's own testdata. Emits one JSON line and BENCH_SCALE.json:
  * per-pipeline seconds at both scales plus the ratio. With ~10× rows
  * a healthy ratio sits well under ~20 (linear + log factors + fixed
  * overheads); a quadratic stage would post 50-100×. */
object BenchScale {
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
    // 10× replication: distinct ids per copy; odd copies perturbed
    val bigPath = s"$tmp/graft_scale10x_docs"
    (0 until 10).map { c =>
      docs.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        (if (c % 2 == 1) concat(col("text"), lit(s" variantmark$c"))
         else col("text")).as("text"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(bigPath)
    val big = spark.read.parquet(bigPath)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    import graft.operators.{Bpe, Dedup, DedupIndex, Similarity, Text, TextSearch}
    val terms = Seq("hash", "join", "stream")
    // one merge table for both scales: the billing pass is what's
    // probed, not the learn; type-grain billing must be sublinear in
    // occurrences (10× corpus, ~same vocabulary → ~no re-encoding)
    val bpe = Bpe.learn(docs, col("doc_id"), col("text"), nMerges = 512)
    def pipelines(d: DataFrame, idx: String): Seq[(String, () => Unit)] =
      Seq(
        "bpe_billing" -> (() =>
          noop(bpe.tokenCounts(d, col("doc_id"), col("text")))),
        // distributed learn: one corpus pass for the word-frequency
        // table, then vocabulary-sized merge rounds — a 10× corpus
        // with ~the same vocabulary pays ~only the extra first pass
        "bpe_learn" -> (() => {
          Bpe.learnDistributed(d, col("doc_id"), col("text"), nMerges = 8)
          ()
        }),
        "dedup_corpus" -> (() =>
          noop(Dedup.dedupCorpus(d, col("doc_id"), col("text")))),
        "dedup_verified" -> (() =>
          noop(Dedup.dedupCorpus(d, col("doc_id"), col("text"),
            jaccardThreshold = Some(0.5)))),
        "span_dedup" -> (() =>
          noop(Dedup.duplicatedSpans(d, col("doc_id"), col("text"), 8))),
        "lm_quality" -> (() =>
          noop(Text.bigramLmScores(d, col("doc_id"), col("text")))),
        // LM + one range-shuffled global rank + integer thirds — must
        // track the LM scan, never a single-partition window
        "perplexity_buckets" -> (() =>
          noop(Text.perplexityBuckets(d, col("doc_id"), col("text")))),
        "trigram_lm" -> (() =>
          noop(Text.trigramLmScores(d, col("doc_id"), col("text")))),
        "pmi_bigrams" -> (() =>
          noop(Text.pmiBigrams(d, col("doc_id"), col("text")))),
        "repetition" -> (() =>
          noop(Text.repetitionScores(d, col("doc_id"), col("text")))),
        "decontaminate" -> (() =>
          noop(Dedup.decontaminate(
            d.filter(col("doc_id") % 7 =!= 0), col("doc_id"), col("text"),
            d.filter(col("doc_id") % 7 === 0), col("doc_id"), col("text"),
            8))),
        "pack_sequences" -> (() =>
          noop(Text.packSequences(d, col("doc_id"), col("text"), 128,
            pmod(col("doc_id"), lit(64))))),
        "quality_filter" -> (() =>
          noop(Text.qualityFilter(d, col("doc_id"), col("text"),
            minTokens = 15, maxTokens = 90, minQuality = 0.55,
            maxDupTokenFrac = 0.6, maxTopBigramFrac = 0.1))),
        // 3 epochs = 3 partial-aggregated scans reducing to 4 longs
        // each — must scale with the read, nothing else
        "quality_fit" -> (() => {
          Text.fitQualityModel(d, col("doc_id"), col("text"),
            (col("doc_id") % 3 === 0).cast("int"))
          ()
        }),
        "text_index_build" -> (() =>
          TextSearch.buildTextIndex(d, col("doc_id"), col("text"), idx)),
        "hybrid_search" -> (() =>
          noop(TextSearch.hybridSearch(spark, idx, terms, 20))),
        "heavy_hitters" -> (() =>
          noop(graft.operators.Frequency.heavyHitters(
            d.select(explode(split(lower(trim(col("text"))), "\\s+"))
              .as("w")).filter(col("w") =!= ""),
            col("w"), 40))),
        "url_dedup" -> (() =>
          noop(graft.operators.Urls.dedupByUrl(d, col("doc_id"),
            concat(lit("HTTPS://Host.Example.COM:443/p/"),
              col("doc_id") % 5000, lit("?utm_source=x&id="),
              col("doc_id") % 5000, lit("#f"))))),
        "corpus_overlap" -> (() =>
          noop(Dedup.corpusOverlap(
            d.filter(col("doc_id") % 2 === 0),
            d.filter(col("doc_id") % 2 =!= 0),
            col("doc_id"), col("text")))),
        "bloom_semijoin" -> (() =>
          noop(graft.functions.Bloom.semiJoinPruned(
            d, col("doc_id"),
            d.filter(col("doc_id") % 97 === 0), col("doc_id")))),
        "paragraph_dedup" -> (() => {
          // the q141 unit derivation: 6-word chunks
          val ws = Text.tokens(col("text"))
          val paras = when(size(ws) > 0,
            transform(sequence(lit(0),
                ceil(size(ws) / lit(6.0)).cast("int") - 1),
              i => array_join(slice(ws, i * 6 + 1, lit(6)), " ")))
            .otherwise(array().cast("array<string>"))
          noop(Dedup.dedupParagraphs(
            d.select(col("doc_id"), paras.as("p")),
            col("doc_id"), col("p"), " "))
        }),
        "token_shards" -> (() =>
          noop(graft.operators.Relational.shardByTokenBudget(d,
            col("doc_id"), Text.tokenCount(col("text")), 500L))),
        // explode + partial-agg type table, then a TakeOrdered of only
        // max(ks) types: a 10× corpus with ~the same vocabulary pays
        // ~only the extra scan (sublinear ratio expected)
        "vocab_coverage" -> (() =>
          noop(Text.vocabCoverage(d, col("text"), Seq(10, 100, 1000)))),
        // (id, md5, token_count) reduction per side + one full-outer
        // join on id — linear in the two snapshots by design
        "corpus_diff" -> (() =>
          noop(Text.corpusDiff(d,
            d.filter(col("doc_id") % 13 =!= 0).select(col("doc_id"),
              concat(col("text"), lit(" x")).as("text")),
            col("doc_id"), col("text")))),
        // one Expand pass over the corpus: linear by design
        "corpus_profile" -> (() =>
          noop(Text.corpusProfile(d.select(col("doc_id"), col("text"),
            pmod(col("doc_id"), lit(7)).cast("string").as("lang"),
            pmod(col("doc_id"), lit(20)).cast("string").as("source")),
            col("text"), Seq("lang", "source")))),
        "temperature_mix" -> (() =>
          noop(graft.operators.Relational.temperatureMix(
            d.select(col("doc_id"),
              concat(lit("s"), pmod(col("doc_id"), lit(7))).as("dom")),
            col("dom"), col("doc_id"), d.count() / 2))),
        // the COMPOSED release chain (q264): each stage is its own
        // probed operator, so the composition must track the max of
        // its stages, never multiply them
        "corpus_release" -> (() =>
          noop(graft.operators.Pipeline.corpusRelease(
            d.select(col("doc_id"), col("text"),
              lit("en").as("lang"),
              length(col("text")).cast("double").as("sc"),
              concat(lit("s"), pmod(col("doc_id"), lit(7))).as("dom")),
            col("doc_id"), col("text"), col("lang"), col("sc"),
            col("dom"),
            benchmark = d.filter(col("doc_id") % 97 === 0),
            bid = col("doc_id"), btext = col("text"), seed = "probe",
            minQuality = 0.0, maxTokens = 100000,
            maxDupTokenFrac = 1.0, maxTopBigramFrac = 1.0))),
        "epoch_shuffle" -> (() =>
          noop(graft.operators.Relational.epochShuffle(
            d.select(col("doc_id")), col("doc_id"), "probe"))),
        "leakfree_split" -> (() =>
          noop(Dedup.assignClusterSplits(
            Dedup.dedupCorpus(d, col("doc_id"), col("text")), 1, 5))),
        "replica_merge" -> (() => {
          // the q144 residue-class replica pair over this corpus size
          def h(tag: String) = md5(concat(col("doc_id").cast("string"),
            lit(":" + tag)))
          def rev(p: Int, tag: String) = concat(lit(s"$p-"), h(tag))
          val ids = d.select(col("doc_id"))
          val none = array().cast("array<string>")
          def leaf(pos: Long, tag: String, del: org.apache.spark.sql.Column,
                   anc: org.apache.spark.sql.Column)(src: DataFrame) =
            src.select(col("doc_id"), lit(pos).as("rev_pos"),
              h(tag).as("rev_hash"), del.as("deleted"), anc.as("ancestors"))
          val a = leaf(2, "r2a", lit(false), array(rev(1, "r1")))(
              ids.filter(col("doc_id") % 2 === 0))
            .unionByName(leaf(1, "r1", lit(false), none)(
              ids.filter(col("doc_id") % 2 =!= 0)))
          val b = leaf(3, "r3", lit(false),
              array(rev(2, "r2a"), rev(1, "r1")))(
              ids.filter(col("doc_id") % 4 === 0))
            .unionByName(leaf(2, "r2b", col("doc_id") % 9 === 0,
              array(rev(1, "r1")))(
              ids.filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 3 === 0)))
            .unionByName(leaf(1, "r1", lit(false), none)(
              ids.filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 3 =!= 0)))
          noop(graft.operators.Revisions.mergeReplicas(a, b, col("doc_id"),
            col("rev_pos"), col("rev_hash"), col("deleted"),
            col("ancestors")))
        }))

    // JIT/codegen warmup on the small corpus so the base timings are
    // not dominated by first-compile costs the 10× run then skips
    pipelines(docs.limit(200), s"$tmp/graft_scale_warm_idx")
      .foreach { case (_, f) => try f() catch { case _: Throwable => () } }

    def best2(f: () => Unit): Double = math.min(time(f()), time(f()))
    val base0 = pipelines(docs, s"$tmp/graft_scale_base_idx")
      .map { case (n, f) => n -> best2(f) }
    val big0 = pipelines(big, s"$tmp/graft_scale_10x_idx")
      .map { case (n, f) => n -> best2(f) }

    // ---- SERVING probes: queries against a 10× INDEX must stay ~flat
    // (probe-pruned reads touch the queried buckets, never the corpus;
    // a ratio near 10 here would mean a serve path secretly scans).
    // Index builds are setup, timed once (they are the ~linear part).
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bigEmbPath = s"$tmp/graft_scale10x_emb"
    (0 until 10).map(c =>
        emb.withColumn("vec_id", col("vec_id") + lit(c * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(bigEmbPath)
    val bigEmb = spark.read.parquet(bigEmbPath)
    def servingSetup(d: DataFrame, e: DataFrame, tag: String)
        : (Seq[(String, Double)], Seq[(String, () => Unit)]) = {
      val txt = s"$tmp/graft_scale_${tag}_idx" // built by the pipeline pass
      val dc = s"$tmp/graft_scale_${tag}_dc"
      val ivf = s"$tmp/graft_scale_${tag}_ivf"
      val sq8 = s"$tmp/graft_scale_${tag}_sq8"
      val bin = s"$tmp/graft_scale_${tag}_bin"
      val builds = Seq(
        "build_dedup_index" -> time(
          DedupIndex.build(d, col("doc_id"), col("text"), dc, nBuckets = 8)),
        "build_ivf_index" -> time(Similarity.buildIvfIndex(e, ivf)),
        "build_sq8_index" -> time(Similarity.buildSq8Index(e, sq8)),
        "build_binary_index" -> time(Similarity.buildBinaryIndex(e, bin)),
        "build_ivfsq8_index" -> time(
          Similarity.buildIvfSq8Index(e, s"$tmp/graft_scale_${tag}_ivfsq8")),
        "build_pq_index" -> time(
          graft.operators.Pq.buildPqIndex(e, s"$tmp/graft_scale_${tag}_pq")),
        "build_ivfpq_index" -> time(graft.operators.Pq.buildIvfPqIndex(
          e, s"$tmp/graft_scale_${tag}_ivfpq")),
        "build_repl_target" -> time(
          graft.operators.Replication.createTarget(spark,
            s"$tmp/graft_scale_${tag}_repl",
            d.select(col("doc_id").as("id"), lit(1L).as("rev_pos"),
              md5(concat(col("doc_id").cast("string"), lit(":1")))
                .as("rev_hash"), lit(false).as("deleted"),
              array().cast("array<string>").as("ancestors")),
            col("id"), col("rev_pos"), col("rev_hash"), col("deleted"),
            col("ancestors"), numBuckets = 64)))
      // 3 smallest cluster labels: a fixed, comparable probe set
      val labels = DedupIndex.clusters(spark, dc)
        .groupBy(col("cluster_id")).count()
        .orderBy(col("cluster_id")).limit(3)
        .collect().map(_.getLong(0)).toSeq
      val mgo = s"$tmp/graft_scale_${tag}_mgo"
      val builds2 = builds :+
        ("build_mango_index" -> time(graft.operators.Mango.createIndex(
          spark, d, "doc_id", Seq("doc_id"), mgo, numBuckets = 8)))
      // a range-bounded find over 1% of the id space: must stay ~flat
      // at 10× (the _kb/_ck pruning path, not a docs scan)
      val hi = 200L
      val findReq = s"""{"selector": {"doc_id": {"$$gte": 0, "$$lt": $hi}},
        "fields": ["doc_id"], "sort": ["doc_id"], "limit": 100}"""
      // the corpus' highest-df token: the worst case for rank-fusion
      // serving (its posting list is ~the corpus; a partition-less
      // rank window here would be the scale-killer the two-phase
      // global rank exists to avoid)
      val hot = d.select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("w")).head().getString(0)
      val probes = Seq(
        "serve_bm25" -> (() =>
          noop(TextSearch.searchIndexed(spark, txt, terms, 20))),
        "serve_rrf_highdf" -> (() =>
          noop(TextSearch.rrfSearch(spark, txt, Seq(hot), 20))),
        "serve_phrase_slop" -> (() =>
          noop(TextSearch.phraseSearchIndexed(spark, txt,
            Seq("hash", "join"), 20, slop = 2))),
        "serve_members" -> (() =>
          noop(DedupIndex.membersOf(spark, dc, labels))),
        "serve_ivf_filtered" -> (() =>
          noop(Similarity.ivfTopKWhere(spark, ivf,
            e.filter(col("vec_id") < 5), 3,
            e.filter(col("vec_id") % 2 === 0).select(col("vec_id"))))),
        "serve_mango_find" -> (() =>
          noop(graft.operators.Mango.findIndexed(spark, d, "doc_id",
            graft.operators.Mango.MangoIndex(mgo, Seq("doc_id")), findReq))),
        // flat compressed-code scans BY DESIGN (the serve_pq_adc
        // shape): cost scales with the code store, at 8 bits / 1 bit
        // per dimension — the ratio here prices the scan, not pruning
        "serve_sq8_indexed" -> (() =>
          noop(Similarity.sq8TopKIndexed(spark, sq8,
            e.filter(col("vec_id") < 5), 10))),
        "serve_binary_indexed" -> (() =>
          noop(Similarity.binaryTopKIndexed(spark, bin,
            e.filter(col("vec_id") < 5), 10))),
        // cascade: binary-code scan + a |q|·k'-row float rerank — the
        // float read must stay flat while the code scan scales
        "cascade_ann" -> (() =>
          noop(Similarity.cascadeTopK(e, e.filter(col("vec_id") < 5),
            10, shortlist = 64, tier = "binary"))),
        // probe-pruned: reads only the queries' probed _kb lists —
        // the ratio must stay ~flat (the serve_ivfadc shape)
        "serve_ivfsq8" -> (() =>
          noop(Similarity.ivfSq8TopK(spark,
            s"$tmp/graft_scale_${tag}_ivfsq8",
            e.filter(col("vec_id") < 5), 10))),
        // PQ cascade: compressed full code scan (linear in the 32×-
        // smaller store) + flat |q|·k' float rerank
        "cascade_pq" -> (() =>
          noop(Similarity.cascadeTopKIndexed(spark,
            s"$tmp/graft_scale_${tag}_pq", e,
            e.filter(col("vec_id") < 5), 10, shortlist = 64,
            tier = "pq"))),
        // IVFADC cascade: probe-pruned list read — must stay ~flat
        "cascade_ivfpq" -> (() =>
          noop(Similarity.cascadeTopKIndexed(spark,
            s"$tmp/graft_scale_${tag}_ivfpq", e,
            e.filter(col("vec_id") < 5), 10, shortlist = 64,
            tier = "ivfpq", nProbe = 4))),
        // Lucene $text over the stamped text index: postings probes +
        // residual on the fetched candidates — term-bucket reads, not
        // a corpus scan (the fetch is bounded by the match)
        "serve_text_lucene" -> (() =>
          noop(graft.operators.Mango.findText(spark, d, "doc_id",
            graft.operators.Mango.MangoTextIndex(txt, Seq("text")),
            s"""{"selector": {"$$text": "($hot OR hash) AND NOT \\\"$hot $hot\\\""},
               | "fields": ["doc_id"], "sort": ["doc_id"],
               | "limit": 100}""".stripMargin))),
        // one relevance-ordered page: postings probe + TakeOrdered —
        // cost follows the matched set's size, never the corpus
        "serve_search_page" -> (() => {
          val (p, _) = TextSearch.searchPage(spark, txt, terms, 20)
          noop(p)
        }),
        // facet aggregation over the matched set: one counts shuffle
        // + one single-row range aggregation
        "serve_search_facets" -> (() => {
          val dd = d.select(col("doc_id"),
            pmod(col("doc_id"), lit(7)).cast("string").as("lang"),
            length(col("text")).as("n_chars"))
          noop(TextSearch.searchFacets(spark, txt, terms, dd, "doc_id",
            countsFields = Seq("lang"),
            ranges = Seq(("n_chars", "short", "[0 TO 300]"),
              ("n_chars", "long", "{300 TO 100000]"))))
        }),
        // store-backed interactive writes: a 100-write batch judged
        // against only its ids' buckets — ~flat whatever the target
        "bulk_docs_store" -> (() => {
          val writes = d.select(col("doc_id")).filter(col("doc_id") < 100)
            .select(col("doc_id").as("id"),
              lit(null).cast("string").as("base"),
              lit("probe").as("body"), lit(false).as("del"))
          graft.operators.Replication.bulkDocsStore(spark,
            s"$tmp/graft_scale_${tag}_repl", writes, col("id"),
            col("base"), col("body"), col("del"))
          ()
        }),
        // 100 local-doc writes rewrite only their ids' _lb buckets —
        // ~flat whatever the store size (the checkpoint-write shape)
        "local_docs_upsert" -> (() => {
          val w = d.select(col("doc_id")).filter(col("doc_id") < 100)
            .select(concat(lit("_local/ck-"), col("doc_id")).as("id"),
              lit("probe").as("body"), lit(false).as("del"))
          graft.operators.Replication.localDocsUpsert(spark,
            s"$tmp/graft_scale_${tag}_repl", w, col("id"), col("body"),
            col("del"))
          ()
        }),
        // count-cache read: N stat calls, no data scanned — must be
        // FLAT at 10× (a ratio near 10 means the cache fell back)
        "dbs_info_cached" -> (() =>
          noop(graft.operators.Replication.dbsInfo(spark,
            Seq("r" -> s"$tmp/graft_scale_${tag}_repl")))))
      (builds2, probes)
    }
    val (baseBuilds, baseProbes) = servingSetup(docs, emb, "base")
    val baseServe = baseProbes.map { case (n, f) => n -> best2(f) }
    val (bigBuilds, bigProbes) = servingSetup(big, bigEmb, "10x")
    val bigServe = bigProbes.map { case (n, f) => n -> best2(f) }

    // ---- SemDeDup: the round-6 scale-killer candidate. Its pairwise
    // stage is cluster-local all-pairs, so a FIXED quantizer posts a
    // quadratic ratio by construction (10× data → 100× pairs). The
    // scale discipline (Abbas et al. use k ~ corpus/2000) is k ∝ n,
    // holding expected cluster size — and so per-row pairwise cost —
    // constant; the broadcast quantizer path is what makes large k
    // expressible. Probed here exactly as deployed: k = n/100.
    def semdedup(e: DataFrame): Unit = {
      val k = math.max(16L, e.count() / 100L).toInt
      noop(Similarity.semDedup(e, tau = 0.3, nCentroids = k))
    }
    val semBase = Seq("semdedup" -> best2(() => semdedup(emb)))
    val semBig = Seq("semdedup" -> best2(() => semdedup(bigEmb)))

    // ---- kNN graph: same cluster-local pairwise stage as SemDeDup,
    // same k ∝ n quantizer discipline → expected ~linear.
    def knn(e: DataFrame): Unit = {
      val k = math.max(16L, e.count() / 100L).toInt
      noop(Similarity.knnGraph(e, 5, nCentroids = k))
    }
    val knnBase = Seq("knn_graph" -> best2(() => knn(emb)))
    val knnBig = Seq("knn_graph" -> best2(() => knn(bigEmb)))

    // ---- Event analytics over a 10×-span event table: funnel carries
    // ONE timestamp per user per stage (skew-flat), retention two
    // aggregations — both expected ~linear in events.
    val events0 = spark.read.parquet(s"$sfDir/events.parquet")
    def evTable(mult: Int): DataFrame =
      (0 until mult).map(c =>
        events0.withColumn("event_id", col("event_id") + lit(c * 10000000L))
          .withColumn("ts", col("ts") + expr(s"INTERVAL ${c * 40} DAYS")))
        .reduce(_ unionByName _)
    def evAnalytics(mult: Int): Seq[(String, () => Unit)] = {
      val ev = graft.sources.EventTime.withTsUs(evTable(mult))
      Seq(
        "funnel" -> (() => noop(graft.operators.EventAnalytics.funnel(
          ev, col("user_id"), col("ts_us"), col("event_type"),
          Seq("view", "click", "purchase"), 7L * 86400000000L))),
        "retention" -> (() => noop(graft.operators.EventAnalytics.retention(
          ev, col("user_id"), col("ts_us"), Seq(0, 1, 7)))))
    }
    val funBase = evAnalytics(1).map { case (n, f) => n -> best2(f) }
    val funBig = evAnalytics(10).map { case (n, f) => n -> best2(f) }

    // ---- Changes feed: a fixed-size tail read over a 10× log must
    // stay ~flat (bucket pruning reads the checkpoint's suffix only).
    def chgProbe(mult: Int, tag: String): Double = {
      val n = 200000L * mult
      val path = s"$tmp/graft_scale_${tag}_chg"
      val log = spark.range(n).select(col("id").as("seq"),
        (col("id") % (n / 2)).as("id"),
        concat(lit("1-"), md5(col("id").cast("string"))).as("rev"),
        lit(false).as("deleted"))
      graft.sources.ChangesFeed.write(log, path, width = 4096)
      best2(() => noop(graft.sources.ChangesFeed.since(spark, path,
        n - 2000)))
    }
    val chgBase = Seq("serve_changes_since" -> chgProbe(1, "base"))
    val chgBig = Seq("serve_changes_since" -> chgProbe(10, "10x"))

    // ---- Feed purge: a FIXED erasure-subject set over a 10× log.
    // Rewrite cost is O(containing buckets) — flat for a fixed subject
    // set; the LOCATING scan is column-pruned but linear in the log,
    // so a mild ratio is expected, never ~10×-of-rewrite. Mutating →
    // timed once (a best-of-2 would time the idempotent no-op).
    def chgPurgeProbe(mult: Int, tag: String): Double = {
      val path = s"$tmp/graft_scale_${tag}_chg" // written by chgProbe
      val victims = (0L until 50L).map(_ * 97L)
      time(graft.sources.ChangesFeed.purge(spark, path, victims))
    }
    val chgPurgeBase = Seq("feed_purge" -> chgPurgeProbe(1, "base"))
    val chgPurgeBig = Seq("feed_purge" -> chgPurgeProbe(10, "10x"))

    // ---- Filtered feed: the selector evaluates over the DOC corpus
    // (one compiled predicate, corpus-linear) and semi-joins the
    // since-pruned tail — expected ~linear in corpus, flat in log tail.
    def chgFilteredProbe(mult: Int, tag: String): Double = {
      val n = 200000L * mult
      val path = s"$tmp/graft_scale_${tag}_chg"
      val corpus = spark.range(n / 2).select(col("id"),
        (col("id") % 7).cast("string").as("cat"))
      best2(() => noop(graft.sources.ChangesFeed.sinceFiltered(spark, path,
        n - 2000, corpus, "id", """{"cat": {"$in": ["1", "3"]}}""")))
    }
    val chgFiltBase = Seq("filtered_feed" -> chgFilteredProbe(1, "base"))
    val chgFiltBig = Seq("filtered_feed" -> chgFilteredProbe(10, "10x"))

    // ---- PQ: ADC serving is a DELIBERATE compressed linear scan (m
    // ints per vector instead of the raw floats) — the healthy ratio
    // here is ~10 (linear over codes), NOT flat; what must stay flat is
    // the per-candidate cost (codes never widen with corpus size). The
    // probe exists so a superlinear regression (e.g. an accidental
    // candidate blow-up before the shortlist) shows as >>10.
    def pqProbe(e: DataFrame, tag: String): Double = {
      val path = s"$tmp/graft_scale_${tag}_pq"
      graft.operators.Pq.buildPqIndex(e, path)
      best2(() => noop(graft.operators.Pq.pqTopKIndexed(spark, path, e,
        e.filter(col("vec_id") < 5), 3)))
    }
    val pqBase = Seq("serve_pq_adc" -> pqProbe(emb, "base"))
    val pqBig = Seq("serve_pq_adc" -> pqProbe(bigEmb, "10x"))

    // ---- IVFADC: the pruned tier — probed lists bound the ADC scan,
    // so with centroid count scaled to the corpus (list size held
    // constant) serving must stay ~flat where flat-PQ rides the ~10×
    // scan. Centroids ∝ corpus is the deployment discipline (same as
    // the SemDeDup k = n/100 probe).
    def ivfPqProbe(e: DataFrame, nCents: Int, tag: String): Double = {
      val path = s"$tmp/graft_scale_${tag}_ivfpq"
      graft.operators.Pq.buildIvfPqIndex(e, path, nCentroids = nCents)
      best2(() => noop(graft.operators.Pq.ivfPqTopK(spark, path, e,
        e.filter(col("vec_id") < 5), 3)))
    }
    val ivfPqBase = Seq("serve_ivfadc" -> ivfPqProbe(emb, 16, "base"))
    val ivfPqBig = Seq("serve_ivfadc" -> ivfPqProbe(bigEmb, 160, "10x"))

    // ---- Event store: a FIXED 2-day window over a store whose total
    // span grows 10× must stay ~flat (day-partition pruning reads the
    // window's directories, never the table).
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    def evProbe(mult: Int, tag: String): Double = {
      val dayUs = 86400000000L
      val src = (0 until mult).map(c =>
        events.withColumn("event_id", col("event_id") + lit(c * 10000000L))
          .withColumn("ts", col("ts") +
            expr(s"INTERVAL ${c * 40} DAYS")))
        .reduce(_ unionByName _)
      val path = s"$tmp/graft_scale_${tag}_evs"
      graft.sources.EventStore.write(src, path)
      val lo = graft.sources.EventTime.withTsUs(events)
        .agg(min(col("ts_us"))).head().getLong(0)
      best2(() => noop(graft.sources.EventStore.readRange(spark, path,
        lo + dayUs, lo + 3 * dayUs)))
    }
    val evBase = Seq("serve_event_window" -> evProbe(1, "base"))
    val evBig = Seq("serve_event_window" -> evProbe(10, "10x"))

    // ---- Continuous replication: a FIXED 1k-doc delta synced into a
    // 10× target must stay ~flat — touched `_b` buckets are located by
    // arithmetic on the delta's ids and only those directories are
    // read/rewritten (buckets ∝ corpus is the deployment discipline,
    // so per-bucket size holds constant). Mutating → timed once.
    def replProbe(mult: Int, tag: String): Double = {
      import graft.operators.Replication
      val n = 200000L * mult
      val path = s"$tmp/graft_scale_${tag}_repl"
      val idc = col("id").cast("string")
      val tgt = spark.range(n).select(idc.as("id"),
        lit(1L).as("rev_pos"), md5(idc).as("rev_hash"),
        lit(false).as("deleted"),
        array().cast("array<string>").as("ancestors"))
      Replication.createTarget(spark, path, tgt, col("id"),
        col("rev_pos"), col("rev_hash"), col("deleted"),
        col("ancestors"), numBuckets = 64 * mult)
      // a SMALL delta (5 docs): touched buckets ≤ 5 at BOTH scales, so
      // the probe isolates the per-bucket cost — a 1000-doc delta
      // would touch most of the 64 base buckets and read the store
      val changed = spark.range(5L).select((col("id") * lit(n / 5))
        .cast("string").as("id"))
      val src = changed.select(col("id"), lit(2L).as("rev_pos"),
        md5(concat(col("id"), lit(":2"))).as("rev_hash"),
        lit(false).as("deleted"),
        array(concat(lit("1-"), md5(col("id")))).as("ancestors"))
      time(Replication.syncBatch(spark, path, src, col("id"),
        col("rev_pos"), col("rev_hash"), col("deleted"),
        col("ancestors"), changed))
    }
    val replBase = Seq("replication_delta" -> replProbe(1, "base"))
    val replBig = Seq("replication_delta" -> replProbe(10, "10x"))

    // ---- Store admin verbs. purge_store: a FIXED 5-doc purge against
    // a target whose buckets follow the deployment discipline
    // (∝ corpus) must stay ~flat — only those docs' buckets rewrite.
    // reshard_store / compact_store are FULL rewrites — linear BY
    // DESIGN (every byte moves once, shuffle-free); the probe exists
    // to catch an accidental superlinearity, not to claim flatness.
    def storeAdminProbes(mult: Int, tag: String): Seq[(String, Double)] = {
      import graft.operators.Replication
      val n = 200000L * mult
      val path = s"$tmp/graft_scale_${tag}_adm"
      val idc = col("id").cast("string")
      val tgt = spark.range(n).select(idc.as("id"), lit(2L).as("rev_pos"),
        md5(concat(idc, lit(":2"))).as("rev_hash"),
        lit(false).as("deleted"),
        array(concat(lit("1-"), md5(idc))).as("ancestors"))
      Replication.createTarget(spark, path, tgt, col("id"),
        col("rev_pos"), col("rev_hash"), col("deleted"),
        col("ancestors"), numBuckets = 64 * mult)
      val rid = (col("id") * lit(n / 5)).cast("string")
      val reqs = spark.range(5L).select(rid.as("id"),
        lit(2L).as("rev_pos"),
        md5(concat(rid, lit(":2"))).as("rev_hash"))
      val tPurge = time(Replication.purgeTarget(spark, path, reqs,
        col("id"), col("rev_pos"), col("rev_hash")))
      val tReshard = time(Replication.reshardTarget(spark, path, 2))
      val tCompact = time(Replication.compactTarget(spark, path, 1))
      Seq("purge_store" -> tPurge, "reshard_store" -> tReshard,
        "compact_store" -> tCompact)
    }
    val admBase = storeAdminProbes(1, "base")
    val admBig = storeAdminProbes(10, "10x")

    // ---- Delta corpus release: release_init is the full-state build
    // (~linear BY DESIGN — every doc's verdicts compute once);
    // release_delta applies a FIXED 5-doc change batch and must stay
    // ~flat at 10× (verdicts for 5 docs, their ≤5 id/fp buckets, the
    // dedup tier's touched membership — never the corpus). Buckets
    // follow the deployment discipline (∝ corpus, like the
    // replication_delta probe) so per-bucket size holds constant and
    // the touched-bucket rewrite prices the batch, not the store.
    // The same file also shows delta ≪ init at each scale, the
    // re-release economics the operator exists for.
    def releaseProbes(d: DataFrame, mult: Int,
                      tag: String): Seq[(String, Double)] = {
      import graft.operators.Pipeline
      val path = s"$tmp/graft_scale_${tag}_rel"
      val src = d.select(col("doc_id"), col("text"),
        lit("en").as("lang"),
        length(col("text")).cast("double").as("sc"),
        concat(lit("s"), pmod(col("doc_id"), lit(7))).as("dom"))
      // the benchmark is FIXED-size at both scales (a deployment's
      // eval suite does not grow with its crawl) — a corpus-∝
      // benchmark would bill its gram table to every delta
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val params = Pipeline.ReleaseParams(minQuality = 0.0,
        maxTokens = 100000, maxDupTokenFrac = 1.0,
        maxTopBigramFrac = 1.0)
      // the dedup tier inherits the scaled bucket budget (the
      // releaseInit default): the DedupIndex v3 members layout keeps
      // its directory count LINEAR in the budget (constant MemberSub
      // factor, never nB²), so per-bucket size holds constant at both
      // scales and the FIXED batch's touched-bucket I/O prices the
      // batch, not the corpus — the r15 4.6× delta ratio was this
      // tier pinned at 64 buckets under the old nB² constraint
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
    val relBase = releaseProbes(docs, 1, "base")
    val relBig = releaseProbes(big, 10, "10x")

    val base = base0 ++ baseBuilds ++ baseServe ++ semBase ++ knnBase ++
      funBase ++ chgBase ++ chgPurgeBase ++ chgFiltBase ++ pqBase ++ ivfPqBase ++ evBase ++ replBase ++ admBase ++ relBase
    val big10 = big0 ++ bigBuilds ++ bigServe ++ semBig ++ knnBig ++
      funBig ++ chgBig ++ chgPurgeBig ++ chgFiltBig ++ pqBig ++ ivfPqBig ++ evBig ++ replBig ++ admBig ++ relBig
    val ratios = base.zip(big10).map { case ((n, b), (_, g)) =>
      n -> (if (b > 0) g / b else -1.0)
    }
    def js(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val line = s"""{"metric":"scale10x","base_sf":"$sfDir",""" +
      s""""base":${js(base)},"x10":${js(big10)},"ratio":${js(ratios)}}"""
    println(line)
    try {
      val w = new java.io.PrintWriter("BENCH_SCALE.json", "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Exception => () }
    spark.stop()
  }
}
