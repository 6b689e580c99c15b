package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Text}

/** Specs for the LLM-pipeline operators with synthetic inputs where the
  * testdata lacks structure (e.g. exact duplicates). */
class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup groups duplicates regardless of case/whitespace") {
    val d = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "HELLO\tWORLD"),
      (4L, "different doc")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(d, $"doc_id", $"text").collect()
    assert(g.length == 2)
    val big = g.find(_.getLong(2) == 3L).get
    assert(big.getLong(1) == 1L) // keeps the smallest id
  }

  test("minhash candidates find a near-duplicate and its jaccard is high") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tomorrow")
    val d = docs.select($"doc_id" + 10000, $"text").toDF("doc_id", "text")
      .unionByName(Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text"))
    val cands = Dedup.minhashCandidatePairs(d, $"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    val jac = Dedup.jaccardPairs(d, $"doc_id", $"text", threshold = 0.2)
      .filter($"doc_a" === 1L && $"doc_b" === 2L)
      .select($"jac").as[Double].collect()
    assert(jac.nonEmpty && jac.head > 0.5)
  }

  test("duplicatedSpans: maximal cross-doc spans; removeSpans leaves no repeats") {
    val license = "this software is provided as is without warranty of any " +
      "kind express or implied" // 14 tokens
    val blockA = "one two three four five six seven eight nine ten" // 10
    val blockB = "red orange yellow green blue indigo violet umber sepia ochre"
    val d = Seq(
      (1L, s"alpha beta $license gamma delta"),
      (2L, s"$license epsilon zeta eta"),
      (3L, "unique content about streams and hash joins nothing shared"),
      (4L, s"prefix words then $license"),
      // two shared blocks separated by per-doc-unique filler longer
      // than n: must stay TWO spans, not merge across the gap
      (5L, s"$blockA f1 f2 f3 f4 f5 f6 f7 f8 f9 $blockB"),
      (6L, s"$blockA g1 g2 g3 g4 g5 g6 g7 g8 g9 $blockB"),
      // an intra-doc repeat is NOT cross-doc contamination
      (7L, "solo phrase repeating here solo phrase repeating here solo " +
        "phrase repeating here solo phrase repeating here")
    ).toDF("doc_id", "text")
    val n = 8
    val spans = Dedup.duplicatedSpans(d, $"doc_id", $"text", n)
    val byDoc = spans.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    // each license copy is reported at its own offset, maximal
    assert(byDoc(1L) == Set((2L, 16L)), s"doc1: ${byDoc.get(1L)}")
    assert(byDoc(2L) == Set((0L, 14L)), s"doc2: ${byDoc.get(2L)}")
    assert(byDoc(4L) == Set((3L, 17L)), s"doc4: ${byDoc.get(4L)}")
    // two blocks with a > n gap stay separate spans
    assert(byDoc(5L) == Set((0L, 10L), (19L, 29L)), s"doc5: ${byDoc.get(5L)}")
    assert(byDoc(6L) == Set((0L, 10L), (19L, 29L)), s"doc6: ${byDoc.get(6L)}")
    // no spans for the unique doc or the intra-doc repeater
    assert(!byDoc.contains(3L) && !byDoc.contains(7L))

    // the rewrite drops exactly the spanned tokens, for every doc
    val clean = Dedup.removeSpans(d, $"doc_id", $"text", spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == "alpha beta gamma delta")
    assert(clean(2L) == "epsilon zeta eta")
    assert(clean(3L) == "unique content about streams and hash joins nothing shared")
    assert(clean(4L) == "prefix words then")
    assert(clean(5L) == "f1 f2 f3 f4 f5 f6 f7 f8 f9")
    assert(clean(7L).startsWith("solo phrase"), "doc7 untouched")
    assert(clean.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "every input doc must appear in the rewrite")

    // the cleaned corpus contains NO repeated n-gram across documents
    val cleaned = clean.toSeq.toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(cleaned, $"doc_id", $"text", n).isEmpty,
      "span-cleaned text must have no cross-doc n-gram left")

    // a doc that is ENTIRELY a shared span rewrites to empty, not absent
    val total = Seq((10L, license), (11L, license)).toDF("doc_id", "text")
    val tSpans = Dedup.duplicatedSpans(total, $"doc_id", $"text", n)
    val tClean = Dedup.removeSpans(total, $"doc_id", $"text", tSpans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tClean == Map(10L -> "", 11L -> ""))
  }

  test("simhash of identical docs equal; near-dups within small hamming") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "completely unrelated words about spark engines and parquet files"))
      .toDF("doc_id", "text")
    val h = Dedup.simhashValues(d, $"doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) < 16)
    assert(java.lang.Long.bitCount(h(1L) ^ h(4L)) > 8)
    val pairs = Dedup.simhashNearDups(d, $"doc_id", "text", maxHamming = 3)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("winnow fingerprints overlap heavily for near-dup docs") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river edge"),
      (3L, "entirely different content with no shared phrases at all here"))
      .toDF("doc_id", "text")
    val fp = Text.winnowRows(d, $"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sim12 = fp(1L).intersect(fp(2L)).size.toDouble / fp(1L).union(fp(2L)).size
    val sim13 = fp(1L).intersect(fp(3L)).size.toDouble / fp(1L).union(fp(3L)).size
    assert(sim12 > 0.5 && sim13 < 0.2)
  }

  test("langId is deterministic and favors stopword hits") {
    val d = Seq(
      (1L, "the cat and the dog of the house to be in place"),
      (2L, "der hund und die katze ist das tier"),
      (3L, "le chat et la maison les arbres des fleurs"))
      .toDF("doc_id", "text")
    val r = d.select($"doc_id", Text.langId($"text").as("p")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("langIdNgram classifies real-language text; agrees with stopword path") {
    val d = Seq(
      (1L, "the cat and the dog of the house went to the market"),
      (2L, "der hund und die katze ist das schöne tier der nicht schläft"),
      (3L, "les arbres et les fleurs étaient déjà près des maisons"),
      (4L, "los niños y las niñas españolas en el pueblo pequeño"),
      (5L, "这是一个中文句子 在这里 的 汉字"))
      .toDF("doc_id", "text")
    val r = d.select($"doc_id", Text.langIdNgram($"text").as("p")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "zh"))
    // langNgramScores: pred == the column form; scores are exact longs
    val sc = Text.langNgramScores(d, $"doc_id", $"text")
    assert(sc.columns.toSeq ==
      Seq("doc_id", "s_en", "s_de", "s_fr", "s_es", "s_zh", "pred"))
    val preds = sc.select($"doc_id", $"pred").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(preds == r)
    // on the synthetic corpus both paths see English-ish soup: the
    // n-gram path must agree with the stopword path on ~every doc
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val both = docs.select(Text.langId($"text").as("a"),
      Text.langIdNgram($"text").as("b"))
    val n = both.count()
    val agree = both.filter($"a" === $"b").count()
    assert(agree.toDouble / n >= 0.9,
      s"stopword vs n-gram agreement ${agree.toDouble / n} below 0.9")
  }

  test("LSH topk achieves reasonable recall against brute force") {
    val queries = emb.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(emb, queries, 5, planes = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    // random vectors: bucket pruning trades recall for candidate count;
    // 4 planes + multi-probe scans ~5/16 of the corpus per query
    assert(recall > 0.15, s"recall=$recall")
    assert(lsh.nonEmpty)
  }

  test("persisted LSH index: identical results, partition-pruned scan") {
    val path = java.nio.file.Files.createTempDirectory("graft-ann").toString +
      "/idx"
    Similarity.buildLshIndex(emb, path)
    val queries = emb.filter($"vec_id" < 10)
    val direct = Similarity.lshTopK(emb, queries, 5)
      .collect().map(_.toSeq).toSet
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val viaIdx = Similarity.lshTopKIndexed(spark, path, queries, 5)
      assert(viaIdx.collect().map(_.toSeq).toSet == direct)
      val scans = viaIdx.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val idxScan = scans.find(_.metadata("Location").contains("graft-ann"))
      assert(idxScan.isDefined, "expected a scan of the persisted index")
      assert(idxScan.get.partitionFilters.nonEmpty,
        "index scan must be pruned to the probe buckets")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("IVF index: nearest lists probed, pruned scan, sane results") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString +
      "/idx"
    Similarity.buildIvfIndex(emb, path)
    val queries = emb.filter($"vec_id" < 10)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val r = Similarity.ivfTopK(spark, path, queries, 5)
      val rows = r.collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(1) <= 5))
      // every query got a full top-5 (probing 4 of 16 lists over 500
      // vectors always yields >= 5 candidates)
      val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
      assert(perQ.values.forall(_ == 5))
      val idxScan = r.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.find(_.metadata("Location").contains("graft-ivf"))
      assert(idxScan.isDefined && idxScan.get.partitionFilters.nonEmpty,
        "inverted-list scan must be pruned to the probed centroids")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ANN upsert rewrites only affected buckets and matches a rebuild") {
    import graft.view.IndexStore
    val dir = java.nio.file.Files.createTempDirectory("graft-annup").toString
    // per-bucket-directory file state: (name, mtime, length) per file
    def state(p: String): Map[String, Set[(String, Long, Long)]] =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("_kb="))
        .map(d => d.getName -> d.listFiles()
          .map(f => (f.getName, f.lastModified(), f.length())).toSet).toMap
    val queries = emb.filter($"vec_id" < 10)
    def negated(lo: Long, hi: Long) =
      emb.filter($"vec_id".between(lo, hi))
        .withColumn("embedding", transform($"embedding", x => -x))

    // LSH: re-embed 20..24 (negation moves every one to a new bucket),
    // delete 25; only their old+new buckets may change on disk
    val path = s"$dir/lsh"
    Similarity.buildLshIndex(emb, path)
    val before = state(s"$path/data")
    val affected = Similarity.upsertLshVectors(spark, path, negated(20, 24),
      deletedIds = Seq(25L))
    val after = state(s"$path/data")
    val touched = affected.map(b => s"_kb=$b").toSet
    before.keySet.filterNot(touched).foreach { d =>
      assert(after(d) == before(d), s"untouched bucket $d was rewritten")
    }
    assert(IndexStore.readMeta(spark, path).updateSeq == 1L)
    // results equal a fresh rebuild over the post-upsert corpus
    val corpus2 = emb.filter(!$"vec_id".between(20, 25))
      .unionByName(negated(20, 24))
    val fresh = s"$dir/lsh_fresh"
    Similarity.buildLshIndex(corpus2, fresh)
    assert(
      Similarity.lshTopKIndexed(spark, path, queries, 5)
        .collect().map(_.toSeq).toSet ==
      Similarity.lshTopKIndexed(spark, fresh, queries, 5)
        .collect().map(_.toSeq).toSet,
      "maintained LSH index diverges from rebuild")

    // IVF: non-centroid vectors 30..33 re-embedded, 34 deleted; the
    // stored quantizer is fixed, so a rebuild over the same corpus
    // (whose init centroids vec_id<16 are unchanged) must agree
    val ipath = s"$dir/ivf"
    Similarity.buildIvfIndex(emb, ipath)
    val ibefore = state(s"$ipath/data")
    val iaffected = Similarity.upsertIvfVectors(spark, ipath, negated(30, 33),
      deletedIds = Seq(34L))
    val iafter = state(s"$ipath/data")
    val itouched = iaffected.map(b => s"_kb=$b").toSet
    ibefore.keySet.filterNot(itouched).foreach { d =>
      assert(iafter(d) == ibefore(d), s"untouched list $d was rewritten")
    }
    val icorpus2 = emb.filter(!$"vec_id".between(30, 34))
      .unionByName(negated(30, 33))
    val ifresh = s"$dir/ivf_fresh"
    Similarity.buildIvfIndex(icorpus2, ifresh)
    assert(
      Similarity.ivfTopK(spark, ipath, queries, 5)
        .collect().map(_.toSeq).toSet ==
      Similarity.ivfTopK(spark, ifresh, queries, 5)
        .collect().map(_.toSeq).toSet,
      "maintained IVF index diverges from rebuild")
  }

  test("approx_count_distinct stays within the configured error bound") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct($"l_partkey", 0.02).as("approx"),
      count_distinct($"l_partkey").as("exact")).collect().head
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("spherical k-means refinement improves IVF assignment quality") {
    def build(iters: Int): String = {
      val p = java.nio.file.Files.createTempDirectory(s"graft-ivf$iters")
        .toString + "/idx"
      Similarity.buildIvfIndex(emb, p, nCentroids = 16, refineIters = iters)
      p
    }
    // mean cosine between each vector and its assigned centroid
    def quality(path: String): Double = {
      val lists = spark.read.parquet(s"$path/data")
      val cents = spark.read.parquet(s"$path/centroids")
      lists.join(cents, lists("_kb") === cents("cid"))
        .select((Similarity.dot($"n_vec", $"cvec") /
          ($"n_nrm" * sqrt(Similarity.dot($"cvec", $"cvec")))).as("c"))
        .agg(avg($"c")).collect().head.getDouble(0)
    }
    val q0 = quality(build(0))
    val q2 = quality(build(2))
    assert(q2 >= q0 - 1e-9, s"refined=$q2 must not degrade init=$q0")
    // and the refined index still answers queries with full top-5s
    val r = Similarity.ivfTopK(spark, build(2), emb.filter($"vec_id" < 5), 5)
      .collect()
    assert(r.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }

  test("bounded top-k aggregate equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter($"vec_id" < 20)
    val got = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // reference: the window-rank form this aggregate replaced
    val c = emb.select($"vec_id".as("n_id"),
      $"embedding".cast("array<double>").as("n_vec"))
      .withColumn("n_nrm", sqrt(Similarity.dot($"n_vec", $"n_vec")))
    val q = queries.select($"vec_id".as("q_id"),
      $"embedding".cast("array<double>").as("q_vec"))
      .withColumn("q_nrm", sqrt(Similarity.dot($"q_vec", $"q_vec")))
    val exp = c.join(broadcast(q), $"n_id" =!= $"q_id")
      .withColumn("cos",
        Similarity.dot($"q_vec", $"n_vec") / ($"q_nrm" * $"n_nrm"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id".asc))
        .cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"n_id",
        graft.gfunctions.round4($"cos").as("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == exp && got.size == 20 * 5)
  }

  test("cosine is 1 for identical vectors, -1 for opposite") {
    val d = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f),
      Array(-1.0f, -2.0f, -3.0f))).toDF("a", "b", "c")
    val r = d.select(Similarity.cosine($"a", $"b"), Similarity.cosine($"a", $"c"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("simhash index: pairs match the on-the-fly operator; probes prune") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-shx")
      .toString + "/idx"
    Dedup.buildSimhashIndex(docs, $"doc_id", "text", path, nBuckets = 32)
    val fly = Dedup.simhashNearDups(docs, $"doc_id", "text")
      .select($"doc_a", $"doc_b", $"hamming".cast("long"))
      .collect().map(_.toSeq).toSet
    val idx = Dedup.simhashPairsIndexed(spark, path)
      .collect().map(_.toSeq).toSet
    assert(idx == fly, "indexed pairs diverge from the on-the-fly banding")
    // probing: a one-doc query set reads at most 4 of 32 bucket dirs
    val q = Dedup.simhashValues(docs.limit(1), $"doc_id", "text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val res = Dedup.simhashProbeIndexed(spark, path, q)
      res.collect()
      val scans = res.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata("Location").contains("bands") => f
      }
      assert(scans.nonEmpty)
      val files = scans.map(_.metrics("numFiles").value).max
      assert(files >= 1 && files <= 4,
        s"probe must read <=4 of 32 band buckets, read $files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("simhash upsert: bucket-local, matches a rebuild") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-shx-up")
      .toString + "/idx"
    Dedup.buildSimhashIndex(docs, $"doc_id", "text", path, nBuckets = 32)
    val changed = Seq((0L, "completely new text about violins"))
      .toDF("doc_id", "text")
    val affected = Dedup.upsertSimhashDocs(spark, path, changed,
      $"doc_id", "text", deletedIds = Seq(1L))
    assert(affected.nonEmpty && affected.size <= 16,
      s"a one-doc upsert touches at most old+new band buckets: $affected")
    val corpus2 = docs.filter(!$"doc_id".isin(0L, 1L))
      .select($"doc_id", $"text").unionByName(changed)
    val fresh = java.nio.file.Files.createTempDirectory("graft-shx-rb")
      .toString + "/idx"
    Dedup.buildSimhashIndex(corpus2, $"doc_id", "text", fresh,
      nBuckets = 32)
    assert(Dedup.simhashPairsIndexed(spark, path).collect().map(_.toSeq).toSet
      == Dedup.simhashPairsIndexed(spark, fresh).collect().map(_.toSeq).toSet,
      "maintained simhash index diverges from rebuild")
    assert(spark.read.parquet(s"$path/bands")
      .filter($"doc_id" === 1L).count() == 0, "tombstone not applied")
    assert(graft.view.IndexStore.readMeta(spark, path).updateSeq == 1L)
  }

  test("dedupCorpus: total mapping, idempotent canonicals, strict shrink") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = Dedup.dedupCorpus(docs, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == docs.count(), "every doc must map to a canonical")
    // canonicals are fixpoints: kept ids map to themselves
    m.values.toSet.foreach((k: Long) => assert(m(k) == k,
      s"canonical $k maps to ${m(k)}"))
    assert(m.values.toSet.size < m.size,
      "corpus with known dups must shrink")
    // a doc and its exact duplicate map to the same canonical
    val fp = docs.select($"doc_id",
      graft.operators.Text.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    fp.groupBy(_._2).values.filter(_.length > 1).take(3).foreach { grp =>
      val ks = grp.map(x => m(x._1)).toSet
      assert(ks.size == 1, s"exact dups split canonicals: $grp -> $ks")
    }
  }

  test("dedup cluster index: upserts merge/split exactly like a rebuild") {
    import graft.operators.DedupIndex
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val path = java.nio.file.Files.createTempDirectory("graft-dcx")
      .toString + "/idx"
    DedupIndex.build(docs, $"doc_id", $"text", path, nBuckets = 16)
    def labelMap(p: String) = DedupIndex.clusters(spark, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = labelMap(path)
    assert(base.size == docs.count())

    // MERGE: a new doc with an existing doc's exact text must join its
    // cluster (band rows identical => pairs with it)
    val donor = docs.filter($"doc_id" === base.keys.min).head().getString(1)
    val newDoc = Seq((100000L, donor)).toDF("doc_id", "text")
    DedupIndex.upsert(spark, path, newDoc, $"doc_id", $"text")
    val merged = labelMap(path)
    assert(merged.size == base.size + 1)
    assert(merged(100000L) == merged(base.keys.min),
      "identical doc must share its donor's cluster")

    // SPLIT/DELETE: tombstone the new doc again; labels return exactly
    // to the baseline, and a changed doc re-clusters like a rebuild
    val eds = Seq((base.keys.max, "completely fresh content zebra"))
      .toDF("doc_id", "text")
    DedupIndex.upsert(spark, path, eds, $"doc_id", $"text",
      deletedIds = Seq(100000L))
    val after = labelMap(path)
    val fresh = java.nio.file.Files.createTempDirectory("graft-dcx2")
      .toString + "/idx"
    DedupIndex.build(docs.filter($"doc_id" =!= base.keys.max)
      .unionByName(eds), $"doc_id", $"text", fresh, nBuckets = 16)
    assert(after == labelMap(fresh),
      "maintained cluster index diverges from a rebuild")
    assert(!after.contains(100000L), "tombstoned doc still labeled")
    assert(graft.view.IndexStore.readMeta(spark, path).updateSeq == 2L)
  }

  test("dedup index: delta into a big cluster rewrites only changed sub-buckets") {
    import graft.operators.DedupIndex
    def fileHashes(dir: String): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map { p =>
          val md = java.security.MessageDigest.getInstance("MD5")
          root.relativize(p).toString ->
            md.digest(java.nio.file.Files.readAllBytes(p))
              .map("%02x".format(_)).mkString
        }.toMap
    }
    // one big duplicate family (identical text => one cluster spanning
    // many member sub-buckets) plus unrelated singletons
    val boiler = "big template family shared boilerplate text body"
    val docs = ((1L to 60L).map(i => (i, boiler)) ++
      (1000L to 1009L).map(i => (i, s"unique independent document $i")))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-dcm")
      .toString + "/idx"
    DedupIndex.build(docs, $"doc_id", $"text", path, nBuckets = 8)
    // the family is one cluster spread over several _cm sub-buckets
    val fam = spark.read.parquet(s"$path/members")
      .filter($"cluster_id" === 1L)
    assert(fam.count() == 60)
    val famBuckets = fam.select($"_cm").distinct().count()
    assert(famBuckets >= 4,
      s"test needs the cluster to span sub-buckets, got $famBuckets")
    val beforeM = fileHashes(s"$path/members")
    val beforeL = fileHashes(s"$path/labels")

    // one new doc joins the family: only ITS label row changes
    val nd = Seq((2000L, boiler)).toDF("doc_id", "text")
    DedupIndex.upsert(spark, path, nd, $"doc_id", $"text")
    assert(spark.read.parquet(s"$path/labels")
      .filter($"doc_id" === 2000L).head().getAs[Long]("cluster_id") == 1L)

    val afterM = fileHashes(s"$path/members")
    val afterL = fileHashes(s"$path/labels")
    def touchedDirs(b: Map[String, String], a: Map[String, String]) =
      (b.keySet ++ a.keySet).filter(f => b.get(f) != a.get(f))
        .map(_.split("/")(0))
    // labels: exactly the new doc's hash bucket
    val lt = touchedDirs(beforeL, afterL)
    assert(lt.size <= 1, s"labels rewrote extra buckets: $lt")
    // members: exactly the (cluster, new doc) sub-bucket — the other
    // sub-buckets of the 60-doc family are byte-identical on disk
    val newCm = spark.read.parquet(s"$path/members")
      .filter($"doc_id" === 2000L).head().getAs[Int]("_cm")
    val mt = touchedDirs(beforeM, afterM)
    assert(mt == Set(s"_cm=$newCm"),
      s"members rewrote beyond the changed sub-bucket: $mt")

    // member expansion serves the whole family from a PRUNED read
    val fam2 = DedupIndex.membersOf(spark, path, Seq(1L))
    assert(fam2.collect().map(_.getLong(0)).toSet ==
      ((1L to 60L).toSet + 2000L), "family expansion wrong")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = DedupIndex.membersOf(spark, path, Seq(1L))
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty,
        "membersOf must prune member sub-buckets")
      // one cluster reads at most its nB=8 sub-bucket dirs (≤8 files),
      // not the full 8×8 layout
      val files = scans.head.metrics("numFiles").value
      assert(files >= 1 && files <= 8,
        s"expected ≤8 pruned sub-bucket files, scanned $files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("filtered ANN: top-k of the allowed set within the probed lists") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-fann")
      .toString + "/idx"
    Similarity.buildIvfIndex(emb, path)
    val queries = emb.filter($"vec_id" < 10)
    val allowed = emb.filter($"vec_id" % 2 === 0).select($"vec_id")
    val got = Similarity.ivfTopKWhere(spark, path, queries, 5, allowed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got.nonEmpty && got.forall(_._3 % 2 == 0),
      "returned a neighbor outside the allowed set")
    // equals filtering the UNfiltered ranking then re-ranking: the
    // filter sits between probing and ranking, so the filtered top-5
    // is the allowed prefix of the full candidate ranking
    val full = Similarity.ivfTopK(spark, path, queries, 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val exp = full.filter(_._3 % 2 == 0).groupBy(_._1).toSeq.flatMap {
      case (q, rows) => rows.sortBy(_._2).take(5).zipWithIndex.map {
        case ((qid, _, nid, cos), i) => (qid, i + 1L, nid, cos)
      }
    }.toSet
    assert(got == exp, "filtered ANN must be the allowed set's own top-k")
    // multi-column allowed frame fails loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKWhere(spark, path, queries, 5, emb)
    }
    assert(e.getMessage.contains("single vec-id column"))
  }

  test("pmiBigrams: collocations outrank chance pairs; minCount filters") {
    import graft.operators.Text
    // "san francisco" always co-occurs; "the" pairs with everything
    val docs = (1L to 20L).map { i =>
      (i, s"san francisco is the city the fog the hills item$i end")
    }.toDF("doc_id", "text")
    val top = Text.pmiBigrams(docs, $"doc_id", $"text",
        minCount = 5L, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2), r.getDouble(3)))
    val pairs = top.map(_._1)
    assert(pairs.contains(("san", "francisco")),
      s"perfect collocation missing from $pairs")
    val byPair = top.map(t => t._1 -> t._3).toMap
    // a deterministic pair (always together) must outrank a
    // promiscuous one ("the" pairs with 3+ different right sides)
    assert(byPair(("san", "francisco")) > byPair.getOrElse(("the", "fog"),
      Double.NegativeInfinity))
    // every returned pair respects minCount
    assert(top.forall(_._2 >= 5L))
    // rare pairs (unique item$i bigrams, count 1) never appear
    assert(pairs.forall { case (a, b) => !a.startsWith("item") })
  }

  test("repetitionScores: looped phrases score high, diverse text low") {
    import graft.operators.Text
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),      // one phrase looped
      (2L, "the quick brown fox jumps over dogs"),  // all distinct
      (3L, "a a a a a a a a")                       // one token looped
    ).toDF("doc_id", "text")
    val r = Text.repetitionScores(docs, $"doc_id", $"text")
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(1), x.getDouble(2))).toMap
    // doc 1: 8 tokens, 2 distinct → dup 0.75; bigrams: "buy now" 4 of 7
    assert(r(1L)._1 == 0.75 && math.abs(r(1L)._2 - 4.0 / 7.0) < 1e-3,
      s"doc 1: ${r(1L)}")
    // doc 2: fully diverse → dup 0, top bigram 1 of 6
    assert(r(2L)._1 == 0.0 && math.abs(r(2L)._2 - 1.0 / 6.0) < 1e-3)
    // doc 3: extreme repetition → both near 1
    assert(r(3L)._1 == 0.875 && r(3L)._2 == 1.0)
    // the filter separates junk from prose
    assert(r(1L)._2 > r(2L)._2 && r(3L)._1 > r(2L)._1)
  }

  test("bigram LM score: formulaic text outranks token salad") {
    import graft.operators.Text
    // corpus where "big data" is a common transition and doc 3 is a
    // rare-transition permutation of the same vocabulary
    val docs = Seq(
      (1L, "big data big data big data"),
      (2L, "big data big data"),
      (3L, "data big salad token big"),
      (4L, "solo")                      // no bigrams -> excluded
    ).toDF("doc_id", "text")
    val s = Text.bigramLmScores(docs, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val m = s.map(x => x._1 -> x._3).toMap
    assert(!m.contains(4L), "a doc without bigrams has no LM score")
    assert(m(1L) > m(3L),
      s"high-probability transitions must outrank rare ones: $m")
    assert(s.forall(_._3 < 0.0), "log-probs are negative")
    // n_bigrams is tokens-1
    assert(s.find(_._1 == 1L).get._2 == 5L)
  }

  test("perplexity buckets: exact thirds, ordered head >= middle >= tail") {
    import graft.operators.Text
    val b = Text.perplexityBuckets(docs, $"doc_id", $"text")
      .select($"doc_id", $"lm_score", $"ppl_bucket")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val n = b.length
    assert(n > 10)
    val byB = b.groupBy(_._3).view.mapValues(_.length).toMap
    // exact integer thirds: |head| = floor(n/3), |head|+|middle| =
    // floor(2n/3)
    assert(byB.getOrElse("head", 0) == n / 3, s"$byB of $n")
    assert(byB.getOrElse("head", 0) + byB.getOrElse("middle", 0) ==
      2 * n / 3, s"$byB of $n")
    // bucket ordering: every head score >= every middle >= every tail
    // (ties across a boundary split by doc id, so >= is exact)
    def scores(k: String) = b.filter(_._3 == k).map(_._2)
    assert(scores("head").min >= scores("middle").max,
      "head must not rank below middle")
    assert(scores("middle").min >= scores("tail").max,
      "middle must not rank below tail")
    // deterministic: a second run buckets identically
    val b2 = Text.perplexityBuckets(docs, $"doc_id", $"text")
      .select($"doc_id", $"ppl_bucket")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(b2 == b.map(x => (x._1, x._3)).toSet)
  }

  test("trigram LM with stupid backoff: pruning makes rare text back off and sink") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "zebra quartz violin nebula crimson harbor tunnel velvet meadow")
    ).toDF("doc_id", "text")
    val m2 = Text.trigramLmScores(d, $"doc_id", $"text", minCount = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(m2(1L)._1 == 7L, "9 tokens yield 7 trigrams")
    assert(m2(1L) == m2(2L) && m2(2L) == m2(3L))
    // the repeated sentence's trigrams have c3 = cb = 3: trigram path,
    // ln(1) = 0 — maximally predictable under its own model
    assert(m2(1L)._2 == 0.0, s"formulaic: ${m2(1L)}")
    // all-singleton text is PRUNED out of the trigram and bigram
    // models and double-backs-off to alpha^2 * c1/N — strongly negative
    assert(m2(4L)._2 < -3.0, s"salad must sink: ${m2(4L)}")
    assert(m2(1L)._2 > m2(4L)._2)
    // without pruning, a self-trained trigram LM is DEGENERATE on
    // unique text (every singleton trigram is 'perfectly predicted') —
    // the reason minCount exists
    val m1 = Text.trigramLmScores(d, $"doc_id", $"text", minCount = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m1(4L) == 0.0)
  }

  test("connected components: chains merge transitively, min id labels") {
    import graft.operators.Dedup
    // two components: a 5-chain (exercises multi-round propagation —
    // label 10 must travel 4 hops) and a disjoint pair; 99 is isolated
    // from the chain but pairs with 40
    val pairs = Seq((50L, 40L), (10L, 20L), (20L, 30L), (30L, 40L),
      (99L, 40L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 10L, 99L -> 10L))
    // a genuinely split graph keeps separate labels
    val two = Seq((1L, 2L), (7L, 8L)).toDF("doc_a", "doc_b")
    val g2 = Dedup.connectedComponents(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
    // refusing to return a half-propagated clustering: a long chain
    // cannot reach fixpoint in one round
    val chain = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIters = 1)
    }
  }

  test("packSequences: concat-and-chunk with boundary spans, per-group") {
    def words(k: Int, tag: String) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val d = Seq(
      (1L, words(3, "a")), (3L, words(4, "b")), (5L, words(6, "c")), // grp 1
      (2L, words(5, "d")), (4L, ""),                                  // grp 0
      (6L, words(11, "e"))                                            // grp 0
    ).toDF("doc_id", "text")
    val out = Text.packSequences(d, $"doc_id", $"text", seqLen = 5,
        group = $"doc_id" % 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // grp 1: lens 3,4,6 at offsets 0,3,7 → doc3 and doc5 cross cuts
    val g1 = out.filter(_._2 == 1L).toSet
    assert(g1 == Set(
      (1L, 1L, 0L, 0L, 3L, 0L, 3L),
      (3L, 1L, 0L, 3L, 5L, 0L, 2L), (3L, 1L, 1L, 0L, 2L, 2L, 4L),
      (5L, 1L, 1L, 2L, 5L, 0L, 3L), (5L, 1L, 2L, 0L, 3L, 3L, 6L)),
      s"grp1: $g1")
    // grp 0: empty doc 4 emits nothing; lens 5,11 at offsets 0,5
    val g0 = out.filter(_._2 == 0L).toSet
    assert(g0 == Set(
      (2L, 0L, 0L, 0L, 5L, 0L, 5L),
      (6L, 0L, 1L, 0L, 5L, 0L, 5L), (6L, 0L, 2L, 0L, 5L, 5L, 10L),
      (6L, 0L, 3L, 0L, 1L, 10L, 11L)), s"grp0: $g0")
    // invariants on a larger random-ish corpus: full coverage, no
    // overlap, every non-final window exactly seqLen tokens
    val big = (1L to 40L).map(i =>
      (i, words((i % 13).toInt + 1, s"w$i"))).toDF("doc_id", "text")
    val L = 7
    val rows = Text.packSequences(big, $"doc_id", $"text", L,
      group = $"doc_id" % 3).collect()
    val sliceLens = rows.map(r => r.getLong(4) - r.getLong(3))
    assert(sliceLens.sum == (1L to 40L).map(i => (i % 13) + 1).sum)
    assert(rows.forall(r =>
      r.getLong(4) - r.getLong(3) == r.getLong(6) - r.getLong(5)))
    for (((grp, seq), rs) <- rows.groupBy(r => (r.getLong(1), r.getLong(2)))) {
      val spans = rs.map(r => (r.getLong(3), r.getLong(4))).sortBy(_._1)
      assert(spans.head._1 == 0L, s"grp $grp seq $seq starts at 0")
      assert(spans.sliding(2).forall {
        case Array((_, e), (s2, _)) => e == s2; case _ => true
      }, s"grp $grp seq $seq contiguous")
      val maxSeq = rows.filter(_.getLong(1) == grp).map(_.getLong(2)).max
      if (seq < maxSeq)
        assert(spans.last._2 == L, s"non-final window grp $grp seq $seq full")
    }
  }

  test("redactPii: staged email/ip/phone redaction with exact counts") {
    val d = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.com or 555-123-4567 ok"),
      (2L, "server 192.168.0.1 and 10.0.0.255 no phones here"),
      // digit-dash local part: must redact as ONE email, zero phones
      (3L, "mail 123-456-7890a@ex.org thanks"),
      (4L, "nothing sensitive at all"),
      (5L, "+49-170-555-0123 and bare 12345678 both phone-shaped")
    ).toDF("doc_id", "text")
    val out = Text.redactPii(d, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L) == ((1, 0, 1, "reach me at <EMAIL> or <PHONE> ok")))
    assert(out(2L) == ((0, 2, 0, "server <IP> and <IP> no phones here")))
    assert(out(3L) == ((1, 0, 0, "mail <EMAIL> thanks")), s"${out(3L)}")
    assert(out(4L) == ((0, 0, 0, "nothing sensitive at all")))
    assert(out(5L) == ((0, 0, 2, "<PHONE> and bare <PHONE> both phone-shaped")))
  }

  test("qualityFilter: named reasons in fixed order; keep iff none fire") {
    val good = "the cat and the dog of the house went to the market in " +
      "town and the day was fine and all of the people said hello there"
    val d = Seq(
      (1L, good),                                  // passes everything
      (2L, "too few words here"),                  // too_short
      (3L, ("spam " * 30).trim),                   // repetitive + short vocab
      (4L, "le chat et la maison les arbres des jardins verts " +
        "bonjour madame merci beaucoup paris")  // french, all distinct
    ).toDF("doc_id", "text")
    val out = Text.qualityFilter(d, $"doc_id", $"text", minTokens = 10,
      maxTokens = 1000, minQuality = 0.2, allowedLangs = Seq("en"),
      maxDupTokenFrac = 0.5, maxTopBigramFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) == ((true, "")), s"doc1: ${out(1L)}")
    assert(out(2L)._2 == "too_short", s"doc2: ${out(2L)}")
    assert(!out(3L)._1 && out(3L)._2.contains("repetitive_tokens") &&
      out(3L)._2.contains("repetitive_bigrams"), s"doc3: ${out(3L)}")
    assert(out(4L) == ((false, "bad_lang")), s"doc4: ${out(4L)}")
    // multiple failures list in the declared fixed order
    val multi = Text.qualityFilter(
      Seq((9L, "le le le le")).toDF("doc_id", "text"),
      $"doc_id", $"text", minTokens = 10, maxTokens = 1000,
      minQuality = 0.99, allowedLangs = Seq("en"),
      maxDupTokenFrac = 0.1, maxTopBigramFrac = 0.1)
      .collect().head.getString(2)
    assert(multi == "too_short,low_quality,bad_lang,repetitive_tokens," +
      "repetitive_bigrams", s"order: $multi")
  }

  test("lineSignals + line thresholds: C4/Dolma rules on hand-built lines") {
    val d = Seq(
      // 4 lines: 2 terminal (the ellipsis line is NOT terminal),
      // 1 all-caps, 1 bullet, 1 ellipsis; blank/whitespace lines drop
      (1L, "a fine sentence.\n\n  \nSHOUTING HEADER\n- a bullet item\ntrails off..."),
      (2L, "no structure at all"),
      (3L, "")
    ).toDF("doc_id", "text")
    val sig = Text.lineSignals(d, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(sig(1L) == ((4L, 1L, 1L, 1L, 1L)), s"doc1: ${sig(1L)}")
    assert(sig(2L) == ((1L, 0L, 0L, 0L, 0L)))
    assert(sig(3L) == ((0L, 0L, 0L, 0L, 0L)),
      "empty text has zero lines, zero counts")
    // thresholds: doc1 trips every line rule at strict settings; doc2
    // only the terminal-punct minimum; zero-line docs trip nothing
    val v = Text.qualityFilter(d, $"doc_id", $"text", minTokens = 0,
      minQuality = 0.0, minTermPunctFrac = 0.5, maxUpperLineFrac = 0.2,
      maxBulletLineFrac = 0.2, maxEllipsisLineFrac = 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2))).toMap
    assert(v(1L) == ((false, "no_terminal_punct,uppercase_lines," +
      "bullet_lines,ellipsis_lines")), s"doc1: ${v(1L)}")
    assert(v(2L) == ((false, "no_terminal_punct")))
    assert(v(3L) == ((true, "")), s"doc3: ${v(3L)}")
    // defaults leave the line rules inactive
    val off = Text.qualityFilter(d, $"doc_id", $"text", minTokens = 0,
        minQuality = 0.0)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(off.values.forall(_ == ""), s"defaults must not fire: $off")
  }

  test("decontaminate: per-doc distinct-gram hits against a benchmark set") {
    val leak = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val bench = Seq(
      (100L, s"benchmark question one $leak and some closing words"),
      (101L, "totally different benchmark prompt about nothing shared")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // 8 tokens of leak + 4 unique → grams: positions 0..4 of a
      // 12-token doc = 5 grams, 1 contaminated (the pure-leak gram)
      (1L, s"$leak unique tail words here"),
      // the full leak twice: distinct grams collapse duplicates
      (2L, s"$leak $leak"),
      (3L, "no overlap with anything in the benchmark corpus at all"),
      (4L, "short doc") // < n tokens → no row
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, $"doc_id", $"text",
      bench, $"doc_id", $"text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains(4L), "sub-n docs carry no grams")
    assert(out(1L) == ((5L, 1L, 0.2)), s"doc1: ${out.get(1L)}")
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    // doc2: 16 tokens → 9 window grams, but duplicated content means
    // distinct grams = 9 (each window distinct: leak-leak crossings
    // differ) — the contaminated one is the pure-leak gram appearing
    // twice, counted ONCE
    val (g2, h2, c2) = out(2L)
    assert(h2 == 1L, s"doc2 hits: $h2")
    assert(c2 == math.floor(h2.toDouble / g2 * 10000 + 0.5) / 10000)
    // a doc that IS a benchmark doc's text scores full contamination
    val twin = Seq((9L, s"benchmark question one $leak and some closing words"))
      .toDF("doc_id", "text")
    val tw = Dedup.decontaminate(twin, $"doc_id", $"text",
      bench, $"doc_id", $"text", n = 8).collect().head
    assert(tw.getDouble(3) == 1.0, s"twin contamination: $tw")
  }

  test("semDedup: keep rule replays driver-side; lowest id per cluster kept") {
    val r = Similarity.semDedup(emb, tau = 0.3).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getBoolean(2)))
    assert(r.length == emb.count())
    val byCluster = r.groupBy(_._2)
    // the smallest id of every cluster has no smaller-id mate -> kept
    assert(byCluster.values.forall(ms => ms.minBy(_._1)._3))
    // independent driver-side replay of the keep rule: a vector is
    // dropped iff ANY smaller-id vector in its cluster sits at
    // round4(cosine) >= tau (left-to-right folds, same as DotProduct)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Double](1).toArray).toMap
    def cos4(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4 + 0.5) / 1e4
    }
    for ((cl, members) <- byCluster) {
      val ms = members.sortBy(_._1)
      for (((id, _, keep), i) <- ms.zipWithIndex) {
        val hasMate = ms.take(i).exists { case (j, _, _) =>
          cos4(vecs(j), vecs(id)) >= 0.3 }
        assert(keep == !hasMate, s"vec $id in cluster $cl: keep=$keep")
      }
    }
    // refined quantizer: same contract, one verdict per vector
    val ref = Similarity.semDedup(emb, tau = 0.3, refineIters = 1)
    assert(ref.count() == emb.count())
    assert(ref.columns.toSeq == Seq("vec_id", "cluster", "keep"))
  }

  test("assignClusterSplits: cluster-atomic, exact quota, total, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val labels = Dedup.dedupCorpus(docs, $"doc_id", $"text")
    val got = Dedup.assignClusterSplits(labels, valNum = 1, valDen = 4)
    // total: every doc labeled exactly once
    assert(got.count() == docs.count())
    // cluster-atomic: no cluster carries both splits — the leakage
    // guarantee (any near-dup pair shares kept_id, hence split)
    val mixed = got.groupBy($"kept_id")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(mixed == 0, "a duplicate cluster must never straddle the split")
    // exact quota at CLUSTER grain
    val nClusters = got.select($"kept_id").distinct().count()
    val valClusters = got.filter($"split" === "val")
      .select($"kept_id").distinct().count()
    assert(valClusters == nClusters / 4,
      s"val clusters $valClusters != floor($nClusters/4)")
    // partitioning-invariant
    val again = Dedup.assignClusterSplits(labels.repartition(7), 1, 4)
    assert(again.orderBy($"doc_id").collect().toSeq ==
      got.orderBy($"doc_id").collect().toSeq)
  }

  test("dedupParagraphs: keep-first across AND within docs; blanks and empty docs survive") {
    val docs = Seq(
      (1L, Seq("alpha", "dup para", "", "dup para")), // intra-doc repeat
      (2L, Seq("dup para", "beta")),                  // cross-doc repeat
      (3L, Seq("", " ")),                             // only blanks
      (4L, Seq.empty[String])                         // no paragraphs
    ).toDF("doc_id", "paras")
    val got = Dedup.dedupParagraphs(docs, $"doc_id", $"paras", sep = "|")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      // doc 1 keeps the FIRST "dup para" (pos 1); the pos-3 copy dies;
      // the blank stays (layout, not content)
      (1L, "alpha|dup para|", 4L, 3L),
      // doc 2's copy loses to doc 1 pos 1
      (2L, "beta", 2L, 1L),
      // blanks never dedup, even against each other ("" vs " " trim equal)
      (3L, "| ", 2L, 2L),
      (4L, "", 0L, 0L)))
    // partitioning-invariant (min-struct keeper, not first-seen)
    val again = Dedup.dedupParagraphs(docs.repartition(5), $"doc_id",
      $"paras", sep = "|").orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(again == got)
  }

  test("importanceScores: target-like docs score higher, integer-exact, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // target domain: legal boilerplate; raw mixes legal + chat noise
    val legal = "the party of the first part shall indemnify the party"
    val chat = "lol u there haha ok brb gtg lmao yeah nope"
    val raw = Seq(
      (1L, legal), (2L, legal + " and the second part"),
      (3L, chat), (4L, chat + " ok ok"),
      (5L, "the party shall indemnify lol")).toDF("id", "txt")
    val target = Seq((10L, legal), (11L, "the first part shall indemnify"))
      .toDF("id", "txt")
    val got = graft.operators.Text.importanceScores(raw, $"id", $"txt",
        target, $"id", $"txt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // per-doc feature counts = n_tokens - 1 bigrams
    assert(got(1L)._1 == 9 && got(3L)._1 == 9)
    // legal docs must outscore chat docs; the mixed doc sits between
    def s(i: Long) = got(i)._2.toDouble / got(i)._1
    assert(s(1L) > s(5L) && s(5L) > s(3L),
      s"expected legal > mixed > chat, got ${s(1L)}, ${s(5L)}, ${s(3L)}")
    // deterministic across reruns (exact integer scores)
    val again = graft.operators.Text.importanceScores(raw, $"id", $"txt",
        target, $"id", $"txt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == got.view.mapValues(_._2).toMap)
  }

  test("fitQualityModel: distributed fit == driver-side reference fit, bit-exact") {
    import org.apache.spark.sql.functions._
    import graft.operators.Text
    val label = (col("lang") === "en").cast("int")
    val w = Text.fitQualityModel(docs, col("doc_id"), col("text"), label)
    // driver-side reference: the same GD over the collected features,
    // every op in the same IEEE order (round4 = floor(x*1e4+0.5)/1e4,
    // per-doc fixed-point integer gradients, identical update expr)
    val rows = Text.qualityModelScores(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("f_len"), col("f_punct"), col("f_stop"))
      .join(docs.select(col("doc_id"), label.cast("double").as("y")),
        Seq("doc_id"))
      .select(col("f_len"), col("f_punct"), col("f_stop"), col("y"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val n = rows.length.toDouble
    val ref = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      val g = Array(0L, 0L, 0L, 0L)
      rows.foreach { case (fl, fp, fs, y) =>
        val z = ref(0) + fl * ref(1) + fp * ref(2) + fs * ref(3)
        val p = math.floor((1.0 / (1.0 + math.exp(-z))) * 10000 + 0.5) / 10000
        val r = p - y
        g(0) += math.floor(1e6 * r + 0.5).toLong
        g(1) += math.floor(1e6 * r * fl + 0.5).toLong
        g(2) += math.floor(1e6 * r * fp + 0.5).toLong
        g(3) += math.floor(1e6 * r * fs + 0.5).toLong
      }
      for (j <- 0 to 3) ref(j) = ref(j) - 0.5 * ((g(j).toDouble / 1e6) / n)
    }
    assert(w.toSeq == ref.toSeq,
      s"distributed fit ${w.toSeq} != reference ${ref.toSeq}")
    // training must move the model off zero and separate the labels:
    // mean prob of en docs above mean prob of the rest
    assert(w.exists(_ != 0.0))
    val scored = Text.qualityModelScores(docs, col("doc_id"), col("text"), w)
      .join(docs.select(col("doc_id"), label.as("y")), Seq("doc_id"))
    val m = scored.groupBy(col("y")).agg(avg(col("prob")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) > m(0),
      s"trained model must rank en above non-en: $m")
    // lr/epoch knobs are live and guarded
    val w1 = Text.fitQualityModel(docs, col("doc_id"), col("text"),
      label, epochs = 1)
    assert(w1.toSeq != w.toSeq)
    intercept[IllegalArgumentException] {
      Text.fitQualityModel(docs, col("doc_id"), col("text"), label,
        epochs = 0)
    }
  }

  test("dedupCorpusBest: same clusters as dedupCorpus, argmax-score canonicals") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 10.0),
      (2L, "the quick brown fox jumps over the lazy dog", 99.0), // exact dup, better
      (3L, "completely different text about spark engines", 5.0),
      (4L, "THE quick   brown fox jumps over the lazy dog", 50.0) // normalizes equal
    ).toDF("doc_id", "text", "q")
    val plain = Dedup.dedupCorpus(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = Dedup.dedupCorpusBest(docs, col("doc_id"), col("text"),
        col("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical membership (same partition into clusters)...
    assert(plain.keySet == best.keySet &&
      plain.groupBy(_._2).values.map(_.keySet).toSet ==
        best.groupBy(_._2).values.map(_.keySet).toSet,
      s"cluster membership must not change: $plain vs $best")
    // ...but the canonical is the argmax-score member, not the min id
    assert(best(1L) == 2L && best(2L) == 2L && best(4L) == 2L,
      s"cluster {1,2,4} must keep the q=99 member: $best")
    assert(best(3L) == 3L)
    // ties break to the lower id
    val tied = Seq((7L, "same same", 1.0), (8L, "same same", 1.0))
      .toDF("doc_id", "text", "q")
    val t = Dedup.dedupCorpusBest(tied, col("doc_id"), col("text"),
        col("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(7L -> 7L, 8L -> 7L))
    // a NULL score ranks below every real score: the unscored dup
    // must lose to a scored member (and all-null clusters still
    // resolve deterministically to the lower id)
    val nullish = Seq((11L, "null cluster text", Some(2.0)),
        (12L, "null cluster text", None),
        (13L, "all unscored here", None),
        (14L, "all unscored here", None))
      .toDF("doc_id", "text", "q")
    val n = Dedup.dedupCorpusBest(nullish, col("doc_id"), col("text"),
        col("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(11L -> 11L, 12L -> 11L, 13L -> 13L, 14L -> 13L),
      s"null-score members must not win scored clusters: $n")
  }

  test("knBigramLmScores: hand-computed interpolated KN, continuation semantics") {
    // corpus: "a b", "a b", "a c", "d b"
    //   c1: a=3, d=1;   c2: (a,b)=2, (a,c)=1, (d,b)=1;  T=3 types
    //   fan N1+(a,·)=2, N1+(d,·)=1; hist N1+(·,b)=2, N1+(·,c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b"))
      .toDF("doc_id", "text")
    def p(c2: Double, c1: Double, n1f: Double, n1p: Double, t: Double) =
      (c2 - 0.75) / c1 + (0.75 * n1f / c1) * (n1p / t)
    def score(ps: Seq[Double]): Double = {
      val s6 = ps.map(x => math.floor(math.log(x) * 1e6 + 0.5).toLong).sum
      math.floor(((s6.toDouble / 1e6) / ps.size) * 1e4 + 0.5) / 1e4
    }
    val pAB = p(2, 3, 2, 2, 3)
    val pAC = p(1, 3, 2, 1, 3)
    val pDB = p(1, 1, 1, 2, 3)
    val got = graft.operators.Text.knBigramLmScores(docs,
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == Map(1L -> (1L, score(Seq(pAB))),
      2L -> (1L, score(Seq(pAB))), 3L -> (1L, score(Seq(pAC))),
      4L -> (1L, score(Seq(pDB)))), s"kn scores: $got")
    // continuation semantics: "b" (2 distinct histories) must make
    // the d->b transition more probable than a hypothetical d->c
    assert(pDB > p(1, 1, 1, 1, 3),
      "a promiscuous continuation must raise the interpolated mass")
    // the frequent-but-locked transition still dominates
    assert(got(1L)._2 > got(3L)._2,
      "the twice-seen bigram must outscore the once-seen one")
  }

  test("corpusProfile: rollup slices, (all) labels, exact integer mean") {
    val docs = Seq(
      ("en", "a", "one two three"),        // 3 tokens, 13 chars
      ("en", "a", "four five"),            // 2 tokens, 9 chars
      ("en", "b", "six"),                  // 1 token, 3 chars
      ("de", "a", "sieben acht neun zehn") // 4 tokens, 21 chars
    ).toDF("lang", "source", "text")
    val prof = Text.corpusProfile(docs, col("text"), Seq("lang", "source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(prof == Set(
      ("en", "a", 2L, 5L, 22L, 3L, 2500L),
      ("en", "b", 1L, 1L, 3L, 1L, 1000L),
      ("de", "a", 1L, 4L, 21L, 4L, 4000L),
      ("en", "(all)", 3L, 6L, 25L, 3L, 2000L),
      ("de", "(all)", 1L, 4L, 21L, 4L, 4000L),
      ("(all)", "(all)", 4L, 10L, 46L, 4L, 2500L)), s"profile: $prof")
    // ONE rollup pass: a single Expand feeds a single aggregation
    val plan = Text.corpusProfile(docs, col("text"), Seq("lang", "source"))
      .queryExecution.optimizedPlan.toString
    assert(plan.split("Expand").length == 2,
      s"corpusProfile must be one Expand/rollup pass:\n$plan")
  }

  test("corpusDiff: added/changed/removed/unchanged with token totals") {
    import graft.operators.Text
    val a = Seq((1L, "x y"), (2L, "p q r"), (3L, "gone doc"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "x y"), (2L, "p q r s"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = Text.corpusDiff(a, b, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      ("added", 1L, 0L, 2L), ("changed", 1L, 3L, 4L),
      ("removed", 1L, 2L, 0L), ("unchanged", 1L, 2L, 2L)),
      s"diff report wrong: $got")
    // identical snapshots: a single unchanged row
    val same = Text.corpusDiff(a, a, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(same == Seq(("unchanged", 3L)))
  }

  test("vocabCoverage: hand-computed curve, deterministic tie order, bounded top") {
    import graft.operators.Text
    // counts: a=4, b=2, c=1, d=1 (ties c/d break on token asc); total=8
    val docs = Seq((1L, "a a a b"), (2L, "b c a"), (3L, "d"))
      .toDF("doc_id", "text")
    val got = Text.vocabCoverage(docs, col("text"), Seq(1, 2, 3, 10))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      (1, 1L, 4L, 0.5), (2, 2L, 6L, 0.75),
      (3, 3L, 7L, 0.875), (10, 4L, 8L, 1.0)), s"curve wrong: $got")
    // cuts must be positive and distinct; an empty corpus is loud
    intercept[IllegalArgumentException] {
      Text.vocabCoverage(docs, col("text"), Seq(2, 2))
    }
    intercept[IllegalArgumentException] {
      Text.vocabCoverage(Seq((1L, "  ")).toDF("doc_id", "text"),
        col("text"), Seq(1))
    }
  }

  test("release state: init/delta serve the from-scratch release; empty delta is a no-op; small delta is bucket-local") {
    import graft.operators.Pipeline
    val base = docs.select($"doc_id", $"text", $"lang", $"n_chars",
      $"source")
    val bench = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id", $"text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-relstate").toString + "/st"
    Pipeline.releaseInit(base, $"doc_id", $"text", $"lang", $"n_chars",
      $"source", bench, $"doc_id", $"text", path, nBuckets = 32)
    assert(Pipeline.stateCurrent(spark, path))
    def served = Pipeline.releaseFromState(spark, path, "release-1")
    // pin each comparison corpus to parquet first: corpusRelease's
    // dedup closure over a union/when-derived plan tree explodes the
    // explain strings (heap), and the gate's real input is a table
    var nScratch = 0
    def scratch(c0: org.apache.spark.sql.DataFrame) = {
      nScratch += 1
      val p = s"$path/../scratch$nScratch"
      c0.write.mode("overwrite").parquet(p)
      val c = spark.read.parquet(p)
      Pipeline.corpusRelease(c, $"doc_id", $"text", $"lang",
        $"n_chars", $"source", bench, $"doc_id", $"text", "release-1")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(served) == rows(scratch(base)),
      "maintained state must serve the from-scratch release")
    // file snapshot for the no-op and locality checks
    def snap(sub: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/$sub"))
        .map(f => f.getPath -> ((f.length, f.lastModified))).toMap
    }
    val s0 = snap("docs")
    // empty delta: the no-op re-release — nothing may move
    assert(Pipeline.releaseDelta(spark, path, base.limit(0), $"doc_id",
      $"text", $"lang", $"n_chars", $"source", bench, $"doc_id",
      $"text") == 0L)
    assert(snap("docs") == s0, "an empty batch must touch no bytes")
    // the 1% crawl day: changed text, deletions, NEW docs that are
    // exact dups of survivors (the cross-generation dedup case)
    val md = base.agg(max($"doc_id")).head().getLong(0)
    val changed = base
      .filter($"doc_id" % 11 === 3 && $"doc_id" % 13 =!= 5)
      .withColumn("text", concat($"text", lit(" zq")))
    val added = base.filter($"doc_id" % 17 === 2)
      .select(($"doc_id" + md + 1).as("doc_id"), $"text", $"lang",
        $"n_chars", lit("srcnew").as("source"))
    val deleted = base.filter($"doc_id" % 13 === 5)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    Pipeline.releaseDelta(spark, path, changed.unionByName(added),
      $"doc_id", $"text", $"lang", $"n_chars", $"source", bench,
      $"doc_id", $"text", deletedIds = deleted, newSeq = 2L)
    val mutated = base.filter($"doc_id" % 13 =!= 5)
      .withColumn("text", when($"doc_id" % 11 === 3,
        concat($"text", lit(" zq"))).otherwise($"text"))
      .unionByName(added)
    assert(rows(served) == rows(scratch(mutated)),
      "delta-maintained state must serve the mutated corpus's " +
        "from-scratch release")
    // single-doc delta rewrites only its own id bucket (plus the fp
    // tier's two buckets) — never the store. The new text is doc 9's
    // EXACTLY: doc 3 keeps its keeper role under a brand-new fp, and
    // doc 9's fp group merges under keeper 3 — the keeper-identity
    // churn that must retire/promote at the ID level (a per-fp-slot
    // diff would tombstone the still-standing keeper and erase it
    // from the dedup tier — the q273 sf0.01 regression)
    val s1 = snap("docs")
    val text9 = mutated.filter($"doc_id" === 9L)
      .select($"text").head().getString(0)
    val one = mutated.filter($"doc_id" === 3L)
      .withColumn("text", lit(text9))
    Pipeline.releaseDelta(spark, path, one, $"doc_id", $"text",
      $"lang", $"n_chars", $"source", bench, $"doc_id", $"text",
      newSeq = 3L)
    val s2 = snap("docs")
    val touched = s2.keySet.filter(k =>
      s1.get(k) != s2.get(k)) ++ (s1.keySet -- s2.keySet)
    val dirs = touched.map(_.split("/_b=")(1).split("/")(0)).toSet
    assert(dirs.size <= 1, s"one changed doc must rewrite one _b " +
      s"bucket, touched: $dirs")
    val mutated2 = mutated.withColumn("text",
      when($"doc_id" === 3L, lit(text9)).otherwise($"text"))
    assert(rows(served) == rows(scratch(mutated2)),
      "incremental-on-incremental must still equal from-scratch")
    // the exact-dup merge must have folded 3 and 9 into one release
    // slot: never both
    val ids = served.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(!(ids.contains(3L) && ids.contains(9L)),
      "docs 3 and 9 are exact dups now — both released means the " +
        "fp-group merge was lost")
  }

  test("corpusRelease: the stages compose — filter, dedup-best, decontaminate, mix, shuffle, pack") {
    import graft.operators.Pipeline
    // every stage provably acts: d4 too short, d5 bad lang, d2 is
    // d1's exact dup (higher score -> d2 is the kept canonical), d3
    // is verbatim benchmark content (contamination 1.0)
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val t1 = mk((1 to 10).map(i => s"alpha$i"))
    val t3 = mk((1 to 10).map(i => s"bench$i"))
    val t6 = mk((1 to 10).map(i => s"omega$i"))
    val corpus = Seq(
      (1L, t1, "en", 1.0, "web"),
      (2L, t1, "en", 9.0, "web"),
      (3L, t3, "en", 5.0, "web"),
      (4L, "short doc here", "en", 5.0, "web"),
      (5L, t6, "xx", 5.0, "books"),
      (6L, t6, "en", 5.0, "books"))
      .toDF("doc_id", "text", "lang", "score", "source")
    val bench = Seq((100L, t3)).toDF("doc_id", "text")
    val rel = Pipeline.corpusRelease(corpus, $"doc_id", $"text",
      $"lang", $"score", $"source", bench, $"doc_id", $"text",
      seed = "t1", seqLen = 4, nShards = 2,
      minTokens = 8, maxTokens = 90, minQuality = 0.0,
      allowedLangs = Seq("en"), maxDupTokenFrac = 1.0,
      maxTopBigramFrac = 1.0, contaminationN = 8,
      maxContamination = 0.3, budgetOf = identity).collect()
    val ids = rel.map(_.getLong(0)).toSet
    assert(ids == Set(2L, 6L),
      s"release must keep the best dup and the clean doc: $ids")
    // packing covers each kept doc's 10 tokens exactly once
    val covered = rel.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start"))
        .sum).toMap
    assert(covered.values.forall(_ == 10L),
      s"token slices must partition each doc: $covered")
    // shuffle positions are 1..n and decide the packing shard
    val pos = rel.map(r => (r.getLong(0), r.getAs[Long]("pos"))).toSet
    assert(pos.map(_._2) == Set(1L, 2L))
    assert(rel.forall(r =>
      r.getAs[Long]("grp") == (r.getAs[Long]("pos") - 1) % 2))
    // reproducible end to end
    val again = Pipeline.corpusRelease(corpus, $"doc_id", $"text",
      $"lang", $"score", $"source", bench, $"doc_id", $"text",
      seed = "t1", seqLen = 4, nShards = 2,
      minTokens = 8, maxTokens = 90, minQuality = 0.0,
      allowedLangs = Seq("en"), maxDupTokenFrac = 1.0,
      maxTopBigramFrac = 1.0, contaminationN = 8,
      maxContamination = 0.3, budgetOf = identity).collect()
    assert(rel.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq, "release must be deterministic")
    // the length floor guards the decontamination hole loudly
    val e = intercept[IllegalArgumentException] {
      Pipeline.corpusRelease(corpus, $"doc_id", $"text", $"lang",
        $"score", $"source", bench, $"doc_id", $"text", seed = "t1",
        minTokens = 4, contaminationN = 8)
    }
    assert(e.getMessage.contains("contamination"))
  }
}
