package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.TextSearch

class TextSearchSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private val terms = Seq("hash", "join", "stream")

  test("bm25: monotone in tf, discounted by doc length") {
    val tiny = Seq(
      (1L, "hash hash hash join"), // high tf, short
      (2L, "hash join"),           // low tf, short
      (3L, "hash " + ("filler " * 50) + "join"), // low tf, long
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val s = TextSearch.bm25Scores(tiny, $"doc_id", $"text",
        Seq("hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!s.contains(4L), "docs matching no term must not score")
    assert(s(1L) > s(2L), "more term occurrences must score higher")
    assert(s(2L) > s(3L), "longer docs must be discounted at equal tf")
    assert(s.values.forall(_ > 0.0))
  }

  test("rrfSearch: reciprocal-rank fusion semantics over the candidate set") {
    val path = Files.createTempDirectory("graft-rrf").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path)
    val got = TextSearch.rrfSearch(spark, path, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // (the exact rank fusion is replayed end-to-end by the q123 oracle;
    // this spec pins the operator-level contract)
    val bm = TextSearch.searchIndexed(spark, path, terms, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val r1 = bm.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    // every fused score is 1/(60+r1) + 1/(60+r2) for positive ranks
    val maxScore = math.floor((1.0 / 61 + 1.0 / 61) * 10000 + 0.5) / 10000
    assert(got.nonEmpty && got.forall { case (_, sc) =>
      sc > 0.0 && sc <= maxScore })
    // descending with doc-id tiebreak
    assert(got.sliding(2).forall(p => p(0)._2 > p(1)._2 ||
      (p(0)._2 == p(1)._2 && p(0)._1 < p(1)._1)))
    // fused docs come from the lexical candidate set, and the winner
    // carries a strong bm25 rank (k0=60 damps but cannot erase rank 1)
    assert(got.map(_._1).toSet.subsetOf(r1.keySet),
      "fused docs must come from the candidate set")
    assert(r1(got.head._1) <= 10,
      s"fused winner ${got.head._1} has bm25 rank ${r1(got.head._1)}")
    // k0 sensitivity: a huge k0 flattens both signals toward equal
    // contributions but must keep the output a permutation of candidates
    val flat = TextSearch.rrfSearch(spark, path, terms, 10, k0 = 100000)
      .collect().map(_.getLong(0)).toSet
    assert(flat.subsetOf(r1.keySet))
    // scale guard: ranking must NOT run a partition-less window (which
    // pulls the whole candidate set — corpus-scale for a high-df term —
    // through one task); the two-phase global rank has no Window at all
    val plan = TextSearch.rrfSearch(spark, path, terms, 10)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"),
      s"rrfSearch must rank via the two-phase global rank, not a window:\n$plan")
  }

  test("indexed search == corpus-scan search, with bucket pruning") {
    val brute = TextSearch.search(docs, $"doc_id", $"text", terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val path = Files.createTempDirectory("graft-txt").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path,
      nBuckets = 64)
    val indexed = TextSearch.searchIndexed(spark, path, terms, 20)
    assert(indexed.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == brute, "index serving must reproduce the scan path exactly")

    // serving scan prunes to the probed term-bucket directories
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = TextSearch.searchIndexed(spark, path, terms, 20)
      assert(q.collect().length == 20)
      val scans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      val postings = scans.filter(_.metadata("Location").contains("postings"))
      assert(postings.nonEmpty, "expected a postings scan in the plan")
      val scan = postings.head
      assert(scan.partitionFilters.nonEmpty,
        "expected _tb partition filters on the postings scan")
      val files = scan.metrics("numFiles").value
      // 3 terms hash into ≤3 of the 64 bucket dirs
      assert(files >= 1 && files <= 3,
        s"expected at most 3 of 64 term-bucket files scanned, got $files")
      assert(scan.metadata("PushedFilters").contains("In(term"),
        s"expected term IN pushed to parquet: ${scan.metadata("PushedFilters")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def fileHashes(dir: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Map.empty
    else java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        root.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
      }.toMap
  }

  test("upsert rewrites only affected term buckets and matches a rebuild") {
    val path = Files.createTempDirectory("graft-txt-up").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path, nBuckets = 16)
    val before = fileHashes(s"$path/postings")

    // doc 1 rewritten with new content, doc 2 deleted
    val changed = Seq((1L, "hash hash stream zebra quagga")).toDF("doc_id", "text")
    val affected = TextSearch.upsertTextDocs(spark, path, changed,
      $"doc_id", $"text", deletedIds = Seq(2L))
    assert(affected.nonEmpty)

    // postings dirs outside the affected set are byte-identical
    val after = fileHashes(s"$path/postings")
    val touched = (before.keySet ++ after.keySet)
      .filter(f => before.get(f) != after.get(f)).map(_.split("/")(0))
    assert(touched.subsetOf(affected.map(b => s"_tb=$b").toSet),
      s"rewrote dirs outside the affected set: $touched vs $affected")

    // the maintained index equals a fresh build over the same corpus
    val corpus2 = docs.filter(!$"doc_id".isin(1L, 2L))
      .select($"doc_id", $"text").unionByName(changed)
    val path2 = Files.createTempDirectory("graft-txt-rb").toString + "/idx"
    TextSearch.buildTextIndex(corpus2, $"doc_id", $"text", path2,
      nBuckets = 16)
    for (q <- Seq(terms, Seq("zebra"), Seq("quagga", "hash"))) {
      val got = TextSearch.searchIndexed(spark, path, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exp = TextSearch.searchIndexed(spark, path2, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == exp, s"maintained index diverged from rebuild for $q")
    }
    // exact stats parity (n, sum_dl drive every BM25 weight)
    val s1 = spark.read.parquet(s"$path/stats")
      .select($"n", $"sum_dl").head()
    val s2 = spark.read.parquet(s"$path2/stats")
      .select($"n", $"sum_dl").head()
    assert(s1 == s2, s"stats diverged: $s1 vs $s2")
    // deleted doc is gone from postings and sidecar
    assert(spark.read.parquet(s"$path/postings")
      .filter($"doc_id" === 2L).count() == 0)
    assert(spark.read.parquet(s"$path/ids")
      .filter($"doc_id" === 2L).count() == 0)
  }

  test("phrase search: positional adjacency, repeats, and boolean filters") {
    val tiny = Seq(
      (1L, "big data data pipeline"),      // "data data" once
      (2L, "data big data data data end"), // "data data" twice
      (3L, "big data only"),
      (4L, "hash join hash join hash")     // "hash join" twice
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-phr").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)

    val dd = TextSearch.phraseSearchIndexed(spark, path,
        Seq("data", "data"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dd == Map(2L -> 2L, 1L -> 1L),
      s"repeated-token phrase counts wrong: $dd")
    val hj = TextSearch.phraseSearchIndexed(spark, path,
        Seq("hash", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hj == Map(4L -> 2L))
    // three-token phrase spans the fold
    val bdd = TextSearch.phraseSearchIndexed(spark, path,
        Seq("big", "data", "data"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bdd == Map(1L -> 1L, 2L -> 1L))

    // boolean: must both, excluded by mustNot
    val bool = TextSearch.searchBoolean(spark, path,
      must = Seq("big", "data"), mustNot = Seq("end"), k = 10)
    val ids = bool.collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L), s"boolean result wrong: $ids")
    // must-all semantics: a doc with only one term never appears
    val strict = TextSearch.searchBoolean(spark, path,
      must = Seq("pipeline", "end"), k = 10).collect()
    assert(strict.isEmpty)
  }

  test("phrase with slop: ordered within-gap matches; slop=0 is the exact phrase") {
    val d = Seq(
      (1L, "alpha beta end here now"),        // adjacent
      (2L, "alpha filler beta end here"),     // gap 1: slop >= 1
      (3L, "alpha f1 f2 beta end"),           // gap 2: slop >= 2
      (4L, "beta alpha end something here"),  // reversed: never
      (5L, "alpha beta then alpha beta again"), // two exact occurrences
      (6L, "alpha alpha beta end word")       // two starts, ONE end
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-slop").toString + "/idx"
    TextSearch.buildTextIndex(d, $"doc_id", $"text", path, nBuckets = 8)
    def hits(slop: Int): Map[Long, Long] =
      TextSearch.phraseSearchIndexed(spark, path, Seq("alpha", "beta"),
        10, slop).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(0) == Map(1L -> 1L, 5L -> 2L, 6L -> 1L), s"slop0: ${hits(0)}")
    assert(hits(1) == Map(1L -> 1L, 2L -> 1L, 5L -> 2L, 6L -> 1L),
      s"slop1: ${hits(1)}")
    assert(hits(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 2L, 6L -> 1L),
      s"slop2: ${hits(2)}")
    // n_occ counts DISTINCT match end positions: doc6's two alphas
    // both reach the one beta, still one occurrence at slop=1
    assert(hits(1)(6L) == 1L)
    // a reversed pair never matches at any slop (order is required)
    assert(!hits(3).contains(4L))
    // a 3-term slopped phrase chains the gaps independently
    val d3 = TextSearch.phraseSearchIndexed(spark, path,
      Seq("alpha", "beta", "end"), 10, slop = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(1L -> 1L, 2L -> 1L, 6L -> 1L), s"3-term slop1: $d3")
  }

  test("token-less corpus fails the build loudly, not with an NPE") {
    val empty = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-empty").toString + "/idx"
    val e = intercept[IllegalArgumentException] {
      TextSearch.buildTextIndex(empty, $"doc_id", $"text", path)
    }
    assert(e.getMessage.contains("no tokens"))
  }

  test("stale-layout artifacts are detected, not silently served") {
    val path = Files.createTempDirectory("graft-fmt").toString + "/idx"
    assert(!TextSearch.indexCurrent(spark, path), "missing index = stale")
    TextSearch.buildTextIndex(docs.limit(5), $"doc_id", $"text", path,
      nBuckets = 4)
    assert(TextSearch.indexCurrent(spark, path))
  }

  test("tfidf vectors: dense, deterministic, similarity-meaningful") {
    val tiny = Seq(
      (1L, "spark query engine spark"),
      (2L, "spark query engine"),       // near-dup of 1
      (3L, "violin sonata orchestra")   // unrelated
    ).toDF("doc_id", "text")
    val v = TextSearch.tfidfVectors(tiny, $"doc_id", $"text", dim = 32)
    val rows = v.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.size == 3 && rows.values.forall(_.length == 32))
    // deterministic across runs
    val again = TextSearch.tfidfVectors(tiny, $"doc_id", $"text", dim = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows == again)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // near-dups measurably closer than unrelated docs
    assert(cos(rows(1L), rows(2L)) > 0.9)
    assert(cos(rows(1L), rows(2L)) > cos(rows(1L), rows(3L)) + 0.3)
    // the vectors plug straight into the Similarity operators
    val knn = graft.operators.Similarity.bruteForceTopK(v,
      v.filter($"vec_id" === 1L), 1).collect()
    assert(knn.length == 1 && knn(0).getAs[Long]("n_id") == 2L)
    // index-derived vectors equal scan-derived vectors
    val path = Files.createTempDirectory("graft-tv").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)
    val vi = TextSearch.tfidfVectorsIndexed(spark, path, dim = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vi == rows, "indexed tfidf diverged from the scan path")
  }

  test("hybrid search: interpolates between pure BM25 and pure vector rank") {
    val path = Files.createTempDirectory("graft-hyb").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path, nBuckets = 16)
    val hybrid = TextSearch.hybridSearch(spark, path, terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(hybrid.length == 20)
    assert(hybrid.map(_._2).sameElements(hybrid.map(_._2).sorted.reverse))
    assert(hybrid.forall { case (_, s) => s > 0.0 && s <= 1.0001 },
      "both fused signals are normalized to [0,1]")
    // alpha=1 reduces to the BM25 ranking over the same candidates
    val alpha1 = TextSearch.hybridSearch(spark, path, terms, 20, alpha = 1.0)
      .collect().map(_.getLong(0)).toSeq
    val bm = TextSearch.searchIndexed(spark, path, terms, 20)
      .collect().map(_.getLong(0)).toSeq
    // same doc set; order may differ only where normalized-rounded
    // scores tie (the bm25/maxb rounding can merge adjacent scores)
    assert(alpha1.toSet == bm.toSet,
      s"alpha=1 must select the BM25 top-k: $alpha1 vs $bm")
    // the fused ranking actually uses the vector signal: alpha=0 and
    // alpha=1 must not produce identical orderings on this corpus
    val alpha0 = TextSearch.hybridSearch(spark, path, terms, 20, alpha = 0.0)
      .collect().map(_.getLong(0)).toSeq
    assert(alpha0 != alpha1, "vector signal had no effect on the ranking")
  }

  test("proximity search: adjacency beats distance at equal BM25") {
    // identical tf and dl for both docs => identical BM25; only the
    // minimum token distance differs
    val tiny = Seq(
      (1L, "hash stream aa bb cc dd ee ff"),
      (2L, "hash aa bb cc dd ee ff stream"),
      (3L, "hash only here no second term")
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-prox").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)
    val r = TextSearch.proximitySearch(spark, path, "hash", "stream", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!r.contains(3L), "single-term doc must not match")
    assert(r(1L) > r(2L), s"adjacent pair must outrank distant: $r")
    // boost bounds: adjacent doubles at most, distant converges to bm25
    assert(r(1L) / r(2L) > 1.2 && r(1L) / r(2L) < 2.1)
  }

  test("proximity search: N-term minimum window span") {
    val tiny = Seq(
      // positions: hash=0 join=1 stream=2 → window span 2
      (1L, "hash join stream x x x x x"),
      // hash=0 join=2 stream=5 → span 5
      (2L, "hash x join x x stream x x"),
      // order doesn't matter: stream=0 join=1 hash=2 → span 2
      (3L, "stream join hash x x x x x"),
      // the best window is NOT at the first occurrences:
      // hash={0,6} join=4 stream=5 → min window [4,6] span 2
      (4L, "hash x x x join stream hash x"),
      // missing stream → excluded
      (5L, "hash join only here x x x x")
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-proxn").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)
    val r = TextSearch.proximitySearch(spark, path,
        Seq("hash", "join", "stream"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!r.contains(5L), "doc missing a term must not match")
    // doc 4 has equal dl and tf(join)=tf(stream)=1 but tf(hash)=2, so
    // compare via span relations instead of absolute scores: docs with
    // span 2 must beat the span-5 doc at equal BM25 (docs 1,2,3 share
    // identical tf/dl → identical BM25)
    assert(r(1L) == r(3L), "same span + same BM25 must tie exactly")
    assert(r(1L) > r(2L), s"tighter window must outrank: $r")
    // span-2 boost vs span-5 boost on the same BM25 base:
    // (1 + 1/3) / (1 + 1/6) = 8/7
    assert(math.abs(r(1L) / r(2L) - 8.0 / 7.0) < 0.001, s"boost ratio: $r")
    // two-term overload still equals the old behavior (min pairwise
    // distance == two-term window span)
    val two = TextSearch.proximitySearch(spark, path, "hash", "stream", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(two.contains(5L) == false || two(5L) > 0)
    assert(two(4L) > two(2L),
      "doc 4's adjacent hash-stream pair (span 1) must outrank doc 2's span 5")
  }

  test("searchWhere: top-k of the FILTERED set, not a post-filtered top-k") {
    val path = Files.createTempDirectory("graft-sw").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path, nBuckets = 16)
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id")
    val got = TextSearch.searchWhere(spark, path, terms, 15, allowed)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got.forall(_._1 % 2 == 0),
      "returned a doc outside the allowed set")
    // equals filtering the FULL ranking then taking 15
    val full = TextSearch.searchIndexed(spark, path, terms, 100000)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 % 2 == 0).take(15).toSeq
    assert(got == full, "searchWhere must be the filtered set's own top-k")
  }

  test("tfidfVectorsFor: densify input bounded by candidates, not corpus") {
    val path = Files.createTempDirectory("graft-tvf").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path, nBuckets = 16)
    val candIds = Seq(2L, 4L, 6L, 8L, 10L)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = TextSearch.tfidfVectorsFor(spark, path,
        candIds.toDF("doc_id"), dim = 32)
      val rows = q.collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(rows.keySet == candIds.toSet)
      // bit-identical to the full-corpus vectors for the same ids
      val full = TextSearch.tfidfVectorsIndexed(spark, path, dim = 32)
        .filter($"vec_id".isin(candIds: _*))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(rows == full,
        "candidate-bounded vectors diverged from the full computation")
      // the semi-join bounds what flows into the densify aggregation:
      // its output rows == the CANDIDATES' posting rows, a small
      // fraction of the corpus postings the old full-index path fed in
      val semis = q.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, "expected a LeftSemi join below the densify")
      val candPostings = spark.read.parquet(s"$path/postings")
        .filter($"doc_id".isin(candIds: _*)).count()
      val totalPostings = spark.read.parquet(s"$path/postings").count()
      assert(semis.head.metrics("numOutputRows").value == candPostings,
        s"semi-join must pass exactly the candidates' postings: " +
          s"${semis.head.metrics("numOutputRows").value} vs $candPostings")
      assert(candPostings < totalPostings / 10,
        "test corpus too small to distinguish candidate from corpus scan")

      // hybridSearch itself is served through the bounded path
      val h = TextSearch.hybridSearch(spark, path, terms, 10)
      assert(h.collect().length == 10)
      val hSemis = h.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(hSemis.nonEmpty,
        "hybridSearch must bound its vector computation to the candidates")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("searchWhere: multi-column allowed frame fails loudly") {
    val tiny = Seq((1L, "hash join"), (2L, "hash stream"))
      .toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-swm").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      TextSearch.searchWhere(spark, path, Seq("hash"), 5,
        tiny.select($"text", $"doc_id"))
    }
    assert(e.getMessage.contains("single doc-id column"))
    // the single-column contract still works end-to-end
    val ok = TextSearch.searchWhere(spark, path, Seq("hash"), 5,
      tiny.filter($"doc_id" === 2L).select($"doc_id"))
    assert(ok.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("analyzer: stamped at build, honored at query time, loud on mismatch") {
    import TextSearch.Analyzer
    val tiny = Seq(
      (1L, "The Hash Join and the Stream"),
      (2L, "hash hash stream of streams"),
      (3L, "unrelated words only")
    ).toDF("doc_id", "text")
    val stop = Seq("the", "and", "of", "to", "in")
    val path = Files.createTempDirectory("graft-an").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path,
      nBuckets = 8, analyzer = Analyzer(stopwords = stop))
    // query terms are normalized with the STORED analyzer: a
    // mixed-case query matches lowercased postings
    val up = TextSearch.searchIndexed(spark, path, Seq("HASH"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val lo = TextSearch.searchIndexed(spark, path, Seq("hash"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(up.nonEmpty && up == lo,
      "serve-time normalization must match build-time analysis")
    // stopwords were never indexed: no postings, no dl contribution
    assert(TextSearch.searchIndexed(spark, path, Seq("the"), 10)
      .collect().isEmpty)
    assert(spark.read.parquet(s"$path/postings")
      .filter($"term".isin(stop: _*)).count() == 0)
    // doc 1 has 3 analyzed tokens (hash join stream), not 6 raw ones
    assert(spark.read.parquet(s"$path/postings")
      .filter($"doc_id" === 1L).head().getAs[Long]("dl") == 3L)
    // identity is readable and the mismatch guard is loud both ways
    assert(TextSearch.analyzerOf(spark, path) ==
      Analyzer(stopwords = stop).canonical)
    TextSearch.requireAnalyzer(spark, path, Analyzer(stopwords = stop))
    val e = intercept[IllegalArgumentException] {
      TextSearch.requireAnalyzer(spark, path, Analyzer())
    }
    assert(e.getMessage.contains("analyzer mismatch"))
    // a pre-analyzer (v2) artifact reads as stale, not silently served
    assert(TextSearch.indexCurrent(spark, path))
  }

  test("analyzer: stemmed index — JVM query stemming mirrors the build") {
    import TextSearch.Analyzer
    // one doc per word; querying the SAME word must hit its own doc,
    // which proves stemJvm(word) == the Column-side stem at build for
    // every rule branch (ies→y, es→e, s→∅, exceptions us/ss, short)
    val words = Seq("queries", "query", "hashes", "joins", "classes",
      "glasses", "bus", "buses", "ties", "dies", "stream", "as", "is")
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-stem").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path,
      nBuckets = 8, analyzer = Analyzer(stem = true))
    words.zipWithIndex.foreach { case (w, i) =>
      val hits = TextSearch.searchIndexed(spark, path, Seq(w), 20)
        .collect().map(_.getLong(0)).toSet
      assert(hits.contains(i.toLong),
        s"query '$w' must match its own doc after stemming")
    }
    // plural and singular collapse: "queries" finds the "query" doc
    val q = TextSearch.searchIndexed(spark, path, Seq("queries"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(q.contains(1L), "'queries' must stem to 'query' and match")
  }

  test("analyzer: a stopword query term never stems into another term's postings") {
    import TextSearch.Analyzer
    // the index removes stopwords BEFORE stemming, so "ties" (a
    // stopword here) never reaches the stemmer at build time; a query
    // for "ties" must NOT stem to "ty" and borrow that term's postings
    val an = Analyzer(stopwords = Seq("ties"), stem = true)
    assert(an.queryTerm("ties") == "ties",
      "stopword query term must stay un-stemmed (postings-less)")
    assert(an.queryTerm("Ties") == "ties", "lowercase precedes the check")
    assert(an.queryTerm("queries") == "query",
      "non-stopword terms still stem")
    val docs = Seq((1L, "ty knot rope"), (2L, "ties knot rope")).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-stopstem").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path,
      nBuckets = 8, analyzer = an)
    assert(TextSearch.searchIndexed(spark, path, Seq("ties"), 10)
      .collect().isEmpty,
      "a stopword query term has no postings and must match nothing")
    assert(TextSearch.searchIndexed(spark, path, Seq("ty"), 10)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "the real 'ty' postings are untouched")
  }

  test("analyzer: upsert keeps the stored analyzer (maintained == rebuild)") {
    import TextSearch.Analyzer
    val an = Analyzer(stopwords = Seq("the", "of"))
    val base = Seq(
      (1L, "the hash of the stream"),
      (2L, "hash join"),
      (3L, "stream processing")
    ).toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-anup").toString + "/idx"
    TextSearch.buildTextIndex(base, $"doc_id", $"text", path,
      nBuckets = 8, analyzer = an)
    val changed = Seq((1L, "the hash of the hash join")).toDF("doc_id", "text")
    TextSearch.upsertTextDocs(spark, path, changed, $"doc_id", $"text")
    val path2 = Files.createTempDirectory("graft-anrb").toString + "/idx"
    TextSearch.buildTextIndex(
      base.filter($"doc_id" =!= 1L).unionByName(changed),
      $"doc_id", $"text", path2, nBuckets = 8, analyzer = an)
    for (q <- Seq(Seq("hash"), Seq("hash", "join"), Seq("stream"))) {
      val got = TextSearch.searchIndexed(spark, path, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exp = TextSearch.searchIndexed(spark, path2, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == exp, s"maintained analyzed index diverged for $q")
    }
    assert(TextSearch.analyzerOf(spark, path) == an.canonical,
      "upsert must preserve the stored analyzer")
  }

  test("fielded BM25F: weights reorder the top-k; field map stamped and guarded") {
    import TextSearch.{buildFieldedTextIndex, searchFielded}
    val d = Seq(
      (1L, "spark tuning", "a guide about many other things entirely unrelated"),
      (2L, "unrelated title", "spark spark spark mentioned often in the body text here"),
      (3L, "another title", "no relevant content at all in this one truly")
    ).toDF("doc_id", "title", "body")
    val dir = Files.createTempDirectory("graft-bm25f").toString
    val heavy = s"$dir/heavy" // title outranks body 5:1
    val flat = s"$dir/flat"
    buildFieldedTextIndex(d, $"doc_id",
      Seq(("title", $"title", 5.0), ("body", $"body", 1.0)), heavy, 8)
    buildFieldedTextIndex(d, $"doc_id",
      Seq(("title", $"title", 1.0), ("body", $"body", 1.0)), flat, 8)
    // the SAME corpus and query, reordered purely by the field weights:
    // doc1 has one title hit, doc2 three body hits
    val topHeavy = searchFielded(spark, heavy, Seq("spark"), 3)
      .collect().map(_.getLong(0)).toSeq
    val topFlat = searchFielded(spark, flat, Seq("spark"), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(topHeavy.head == 1L, s"title-weighted order: $topHeavy")
    assert(topFlat.head == 2L, s"flat order: $topFlat")
    assert(topHeavy.toSet == Set(1L, 2L) && topFlat.toSet == Set(1L, 2L),
      "only docs containing the term may rank")
    // the field map is stamped and guarded, requireAnalyzer-style
    assert(TextSearch.fieldsOf(spark, heavy) ==
      Seq(("title", 5.0), ("body", 1.0)))
    TextSearch.requireFields(spark, heavy, Seq(("title", 5.0), ("body", 1.0)))
    val e = intercept[IllegalArgumentException] {
      TextSearch.requireFields(spark, heavy, Seq(("title", 1.0), ("body", 1.0)))
    }
    assert(e.getMessage.contains("field map mismatch"))
    // artifact kinds are mutually unreadable (distinct format stamps)
    assert(!TextSearch.indexCurrent(spark, heavy))
    assert(TextSearch.fieldedCurrent(spark, heavy))
    assert(!TextSearch.fieldedCurrent(spark,
      Files.createTempDirectory("graft-nope").toString + "/missing"))
  }

  test("fielded upsert: bucket-local, matches a rebuild, per-field stats exact") {
    import TextSearch.{buildFieldedTextIndex, searchFielded, upsertFieldedDocs}
    val toks = graft.operators.Text.tokens($"text")
    val fields = Seq(
      ("head", concat_ws(" ", slice(toks, 1, 12)), 3.0),
      ("tail", concat_ws(" ", slice(toks, lit(13),
        greatest(size(toks) - 12, lit(0)))), 1.0))
    val changedFs = fields.map { case (n, c, _) => (n, c) }
    val path = Files.createTempDirectory("graft-bm25f-up").toString + "/idx"
    buildFieldedTextIndex(docs, $"doc_id", fields, path, nBuckets = 16)
    val before = fileHashes(s"$path/postings")

    // doc 1 rewritten (every field re-derives), doc 2 deleted
    val changed = Seq((1L, "hash hash stream zebra quagga wolf lynx " +
      "otter stoat marten puffin auk tail tokens land here after twelve"))
      .toDF("doc_id", "text")
    val affected = upsertFieldedDocs(spark, path, changed, $"doc_id",
      changedFs, deletedIds = Seq(2L))
    assert(affected.nonEmpty)
    val after = fileHashes(s"$path/postings")
    val touched = (before.keySet ++ after.keySet)
      .filter(f => before.get(f) != after.get(f)).map(_.split("/")(0))
    assert(touched.subsetOf(affected.map(b => s"_tb=$b").toSet),
      s"rewrote dirs outside the affected set: $touched vs $affected")

    // maintained == rebuilt over the same corpus: identical BM25F
    val corpus2 = docs.filter(!$"doc_id".isin(1L, 2L))
      .select($"doc_id", $"text").unionByName(changed)
    val path2 = Files.createTempDirectory("graft-bm25f-rb").toString + "/idx"
    buildFieldedTextIndex(corpus2, $"doc_id", fields, path2, nBuckets = 16)
    for (q <- Seq(terms, Seq("zebra"), Seq("quagga", "hash"))) {
      val got = searchFielded(spark, path, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exp = searchFielded(spark, path2, q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == exp, s"maintained fielded index diverged for $q")
    }
    // per-field stats parity and stamp preservation
    def st(p: String) = spark.read.parquet(s"$p/stats")
      .orderBy($"ord").select($"field", $"weight", $"n", $"sum_dl")
      .collect().toSeq
    assert(st(path) == st(path2), s"${st(path)} vs ${st(path2)}")
    assert(TextSearch.fieldsOf(spark, path) ==
      Seq(("head", 3.0), ("tail", 1.0)))
    // deleted doc gone from postings and sidecar
    assert(spark.read.parquet(s"$path/postings")
      .filter($"doc_id" === 2L).count() == 0)
    assert(spark.read.parquet(s"$path/ids")
      .filter($"doc_id" === 2L).count() == 0)
    // a field-map mismatch in the changed columns fails loudly
    val e = intercept[IllegalArgumentException] {
      upsertFieldedDocs(spark, path, changed, $"doc_id",
        changedFs.reverse)
    }
    assert(e.getMessage.contains("stored field map"))
  }

  test("driver-side term bucket matches the Column-side routing") {
    val n = 64
    val ts = Seq("hash", "join", "stream", "a", "zebra", "", "日本語")
    val colSide = ts.toDF("t").select(
        pmod(conv(substring(md5($"t".cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(n.toLong)).cast("int"))
      .as[Int].collect().toSeq
    assert(colSide == ts.map(TextSearch.termBucketJvm(_, n)),
      "JVM-side bucket routing must match the build-side expression")
  }

  test("searchPage: walked pages == full ranking, strictly-after resume, loud bookmarks") {
    val path = Files.createTempDirectory("graft-pg").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path, nBuckets = 16)
    val full = TextSearch.searchIndexed(spark, path,
        Seq("hash", "join"), Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full.size > 20, "corpus too small for a paging test")

    var bm: Option[String] = None
    var walked = Seq.empty[(Long, Double)]
    var pages = 0
    var done = false
    while (!done) {
      val (p, next) = TextSearch.searchPage(spark, path,
        Seq("hash", "join"), 7, bm)
      val rows = p.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows.size <= 7)
      walked ++= rows; pages += 1; bm = next
      done = next.isEmpty
      assert(pages < 1000, "paging did not terminate")
    }
    // concatenation IS the ranking: same rows, same order, no dups
    assert(walked == full,
      s"walked ${walked.size} rows != full ranking ${full.size}")
    assert(pages == (full.size + 6) / 7, s"wrong page count $pages")

    // a malformed bookmark is rejected, not misread
    intercept[IllegalArgumentException] {
      TextSearch.searchPage(spark, path, Seq("hash"), 5, Some("notacursor"))
    }
    intercept[IllegalArgumentException] {
      TextSearch.searchPage(spark, path, Seq("hash"), 0)
    }
  }

  test("searchFacets: full-set counts, range labels, drilldown composition") {
    val tiny = Seq(
      (1L, "hash join", "en", "a", 100L),
      (2L, "hash scan", "en", "b", 250L),
      (3L, "hash hash hash", "de", "a", 400L),
      (4L, "join join", "fr", "a", 50L),
      (5L, "nothing matching here", "en", "a", 999L),
      (6L, "hash", null, "b", 300L)
    ).toDF("doc_id", "text", "lang", "src", "n")
    val path = Files.createTempDirectory("graft-fct").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)

    def facets(drill: Seq[(String, String)]) =
      TextSearch.searchFacets(spark, path, Seq("hash", "join"), tiny,
          "doc_id", countsFields = Seq("lang", "src"),
          ranges = Seq(("n", "low", "[0 TO 199]"),
            ("n", "high", "{199 TO 500]"),
            ("n", "none", "[1000 TO 2000]")),
          drilldown = drill)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSet

    // matched set = docs 1,2,3,4,6 (doc 5 has no query term)
    assert(facets(Nil) == Set(
      ("counts", "lang", "en", 2L), ("counts", "lang", "de", 1L),
      ("counts", "lang", "fr", 1L),            // doc 6's null lang drops
      ("counts", "src", "a", 3L), ("counts", "src", "b", 2L),
      ("ranges", "n", "low", 2L), ("ranges", "n", "high", 3L),
      ("ranges", "n", "none", 0L)),            // empty label still reports
      s"undrilled facets wrong: ${facets(Nil)}")

    // repeated drilldown field ORs, distinct fields AND:
    // lang in (en, de) AND src = a -> docs 1, 3
    assert(facets(Seq(("lang", "en"), ("lang", "de"), ("src", "a"))) ==
      Set(("counts", "lang", "en", 1L), ("counts", "lang", "de", 1L),
        ("counts", "src", "a", 2L),
        ("ranges", "n", "low", 1L), ("ranges", "n", "high", 1L),
        ("ranges", "n", "none", 0L)))

    // a non-range spec fails loudly
    intercept[IllegalArgumentException] {
      TextSearch.searchFacets(spark, path, Seq("hash"), tiny, "doc_id",
        ranges = Seq(("n", "bad", "oops")))
    }

    // Lucene open-ended ranges: * is an unbounded side, [* TO *] means
    // "field exists"; a non-numeric bound names the facet, never a
    // bare NumberFormatException
    val open = TextSearch.searchFacets(spark, path, Seq("hash", "join"),
        tiny, "doc_id",
        ranges = Seq(("n", "ge200", "[200 TO *]"),
          ("n", "lt200", "[* TO 199]"), ("n", "any", "[* TO *]")))
      .collect().map(r => (r.getString(2), r.getLong(3))).toMap
    assert(open == Map("ge200" -> 3L, "lt200" -> 2L, "any" -> 5L),
      s"open-ended ranges wrong: $open")
    val err = intercept[IllegalArgumentException] {
      TextSearch.searchFacets(spark, path, Seq("hash"), tiny, "doc_id",
        ranges = Seq(("n", "bad", "[abc TO 5]")))
    }
    assert(err.getMessage.contains("bad") && err.getMessage.contains("abc"))
  }

  test("searchPageSorted: keyset pages in field order, include_docs, null sort excluded") {
    val tiny = Seq(
      (1L, "hash join", "en", Some(100L)), (2L, "hash scan", "en", Some(250L)),
      (3L, "hash hash", "de", Some(400L)), (4L, "join join", "fr", Some(50L)),
      (5L, "nothing here", "en", Some(999L)), (6L, "hash", "de", Some(250L)),
      (7L, "join", "en", Option.empty[Long]))
      .toDF("doc_id", "text", "lang", "n")
    val path = Files.createTempDirectory("graft-srt").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)
    // matched: 1,2,3,4,6 (5 matches nothing, 7's sort value is null)
    var bm: Option[String] = None
    var walked = Seq.empty[(Long, Long, String)]
    var done = false
    while (!done) {
      val (p, next) = TextSearch.searchPageSorted(spark, path,
        Seq("hash", "join"), 2, tiny, "doc_id", "n", bookmark = bm,
        includeDocs = true)
      assert(p.columns.toSet == Set("doc_id", "text", "lang", "n"),
        "include_docs must carry the full doc row")
      walked ++= p.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n"),
          r.getAs[String]("lang")))
      bm = next; done = next.isEmpty
    }
    assert(walked == Seq((4L, 50L, "fr"), (1L, 100L, "en"),
      (2L, 250L, "en"), (6L, 250L, "de"), (3L, 400L, "de")),
      s"sorted walk wrong: $walked")
    // descending flips the order, same set
    val (d1, _) = TextSearch.searchPageSorted(spark, path,
      Seq("hash", "join"), 10, tiny, "doc_id", "n", descending = true)
    assert(d1.select("doc_id").as[Long].collect().toSeq ==
      Seq(3L, 2L, 6L, 1L, 4L))
    // a missing sort field and a bad bookmark fail loudly
    intercept[IllegalArgumentException] {
      TextSearch.searchPageSorted(spark, path, Seq("hash"), 5, tiny,
        "doc_id", "nope")
    }
    intercept[IllegalArgumentException] {
      TextSearch.searchPageSorted(spark, path, Seq("hash"), 5, tiny,
        "doc_id", "n", bookmark = Some("notacursor"))
    }
  }

  test("searchPageDocs: relevance pages carry doc rows in serve order") {
    val path = Files.createTempDirectory("graft-pgd").toString + "/idx"
    TextSearch.buildTextIndex(docs, $"doc_id", $"text", path, nBuckets = 16)
    val (bare, nb) = TextSearch.searchPage(spark, path,
      Seq("hash", "join"), 25)
    val (rich, nr) = TextSearch.searchPageDocs(spark, path,
      Seq("hash", "join"), 25, docs, "doc_id")
    assert(nb == nr, "bookmark must be the plain searchPage's")
    val b = bare.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r = rich.select("doc_id", "score").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(b == r, "joined page must keep serve order and scores")
    assert(rich.columns.contains("lang") && rich.columns.contains("text"))
  }

  test("searchGrouped: top groups by best hit, per-group counts and hit cut") {
    val tiny = Seq(
      (1L, "hash hash hash hash", "en"),   // en's best (high tf)
      (2L, "hash", "en"),
      (3L, "hash hash", "de"),
      (4L, "hash filler filler", "de"),
      (5L, "hash hash hash", "fr"),
      (6L, "nothing", "fr"))
      .toDF("doc_id", "text", "lang")
    val path = Files.createTempDirectory("graft-grp").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)
    val got = TextSearch.searchGrouped(spark, path, Seq("hash"), tiny,
        "doc_id", "lang", groupLimit = 2, limitPerGroup = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // groups ranked by best hit: en (doc 1, tf 4) then fr (doc 5, tf 3);
    // de's best (tf 2) is cut by groupLimit=2; one hit each, full counts
    assert(got.map(x => (x._1, x._2, x._3, x._4)) ==
      Seq((1L, "en", 2L, 1L), (2L, "fr", 1L, 5L)),
      s"grouped result wrong: $got")
    val all = TextSearch.searchGrouped(spark, path, Seq("hash"), tiny,
        "doc_id", "lang", groupLimit = 10, limitPerGroup = 10)
    assert(all.count() == 5, "doc 6 matches nothing; others all serve")
  }

  test("searchGrouped group_sort: groups cut and ordered by field, hits stay relevance") {
    val tiny = Seq(
      (1L, "hash hash hash hash", "en"),
      (2L, "hash", "en"),
      (3L, "hash hash", "de"),
      (4L, "hash filler filler", "de"),
      (5L, "hash hash hash", "fr"),
      (6L, "nothing", "fr"))
      .toDF("doc_id", "text", "lang")
    val path = Files.createTempDirectory("graft-gsrt").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 8)
    // group_sort by the group field ascending: de, en make the cut
    // (relevance order would be en, fr — q246's rule)
    val asc = TextSearch.searchGrouped(spark, path, Seq("hash"), tiny,
        "doc_id", "lang", groupLimit = 2, limitPerGroup = 1,
        groupSort = Some(("lang", true)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(asc.toSeq == Seq((1L, "de", 3L), (2L, "en", 1L)),
      s"lang-asc group order wrong: ${asc.toSeq}")
    // group-head rule on a non-group field, descending: groups order
    // by their MAX doc_id — fr(5), de(4) cut en(2)
    val desc = TextSearch.searchGrouped(spark, path, Seq("hash"), tiny,
        "doc_id", "lang", groupLimit = 2, limitPerGroup = 1,
        groupSort = Some(("doc_id", false)))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(desc.toSeq == Seq((1L, "fr"), (2L, "de")),
      s"doc_id-desc group order wrong: ${desc.toSeq}")
  }

  test("perfield analyzers: per-field stopwords stamp, probe, and survive upsert") {
    import TextSearch.{Analyzer, buildFieldedTextIndex, searchFielded}
    val d = Seq(
      (1L, "spark join spark", "stream filter stream"),
      (2L, "join join join", "stream stream stream"),
      (3L, "spark guide", "filter guide"))
      .toDF("doc_id", "title", "body")
    val path = Files.createTempDirectory("graft-pf").toString + "/idx"
    val anT = Analyzer(stopwords = Seq("join"))
    val anB = Analyzer(stopwords = Seq("stream"))
    buildFieldedTextIndex(d, $"doc_id",
      Seq(("title", $"title", 2.0), ("body", $"body", 1.0)), path,
      nBuckets = 8, perField = Map("title" -> anT, "body" -> anB))
    assert(TextSearch.fieldAnalyzersOf(spark, path) ==
      Seq(("title", anT), ("body", anB)), "perfield stamp wrong")
    // the same term's fate differs per field: "join" occurs only in
    // titles where it is stopworded; "stream" only in bodies, ditto
    assert(searchFielded(spark, path, Seq("join"), 10).isEmpty)
    assert(searchFielded(spark, path, Seq("stream"), 10).isEmpty)
    // non-stopword terms serve normally from their fields
    val sp = searchFielded(spark, path, Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(sp == Seq(1L, 3L), s"title matches wrong: $sp (tf order)")
    val fl = searchFielded(spark, path, Seq("filter"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(fl == Set(1L, 3L), s"body matches wrong: $fl")
    // maintenance tokenizes each field under ITS stamped analyzer and
    // preserves the stamps
    TextSearch.upsertFieldedDocs(spark, path,
      Seq((4L, "join spark", "filter fresh")).toDF("doc_id", "title", "body"),
      $"doc_id", Seq(("title", $"title"), ("body", $"body")))
    assert(TextSearch.fieldAnalyzersOf(spark, path) ==
      Seq(("title", anT), ("body", anB)), "upsert lost the stamps")
    assert(searchFielded(spark, path, Seq("join"), 10).isEmpty,
      "doc 4's title 'join' must be stopworded by the stored analyzer")
    assert(searchFielded(spark, path, Seq("spark"), 10).count() == 3)
  }

  test("searchIncludeFields: projected fields, pruned scan, page-sized join") {
    val tiny = Seq(
      (1L, "alpha hash beta hash", "en", Some(10L)),
      (2L, "hash gamma", "de", None),
      (3L, "nothing relevant", "fr", Some(30L)))
      .toDF("doc_id", "text", "lang", "n_chars")
    val path = Files.createTempDirectory("graft-incf").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 4)
    val got = TextSearch.searchIncludeFields(spark, path, Seq("hash"),
        tiny, "doc_id", Seq("lang", "n_chars"), k = 10)
    assert(got.columns.toSeq == Seq("doc_id", "score", "lang", "n_chars"),
      s"response shape: ${got.columns.mkString(",")}")
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // rank order is the BM25 order; a null stored field rides as null
    assert(rows == Seq((1L, "en", 10L), (2L, "de", -1L)),
      s"projected hits wrong: $rows")
    // a field the corpus does not store is an error, not a null column
    val err = intercept[IllegalArgumentException] {
      TextSearch.searchIncludeFields(spark, path, Seq("hash"), tiny,
        "doc_id", Seq("lang", "nope"), k = 10)
    }
    assert(err.getMessage.contains("nope"))
    // scale guard: the corpus side of the projection join reads ONLY
    // id + requested columns (never text), and the page side (k rows)
    // broadcasts — field cost follows the page, not the corpus
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
    val bigPath = Files.createTempDirectory("graft-incf2").toString + "/idx"
    TextSearch.buildTextIndex(full, $"doc_id", $"text", bigPath)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = TextSearch.searchIncludeFields(spark, bigPath, terms, full,
        "doc_id", Seq("lang", "n_chars"), k = 20)
      assert(q.count() == 20)
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastHashJoin"),
        s"page must broadcast against the corpus:\n$plan")
      val docScans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
          if f.metadata("Location").contains("documents.parquet") => f
      }
      assert(docScans.nonEmpty, "expected a corpus scan")
      val rs = docScans.head.metadata("ReadSchema")
      assert(!rs.contains("text"),
        s"corpus scan must prune the text column: $rs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("searchPartitioned: partition-local stats, pruned dirs, family split") {
    // two partitions of different sizes sharing a term: partition-
    // local df/N must score the SAME text differently per partition
    val tiny = Seq(
      ("acme:1", "hash join alpha"),
      ("acme:2", "hash beta gamma"),
      ("acme:3", "hash delta"),
      ("zeta:1", "hash join alpha"))
      .toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-psearch").toString + "/idx"
    TextSearch.buildPartitionedTextIndex(tiny, $"doc_id", $"text", path,
      nBuckets = 4)
    assert(TextSearch.partitionedIndexCurrent(spark, path))
    val acme = TextSearch.searchPartitioned(spark, path, "acme",
        Seq("hash", "join"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val zeta = TextSearch.searchPartitioned(spark, path, "zeta",
        Seq("hash", "join"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // acme:1 has both terms; 2 vs 3 order follows the dl discount
    assert(acme.map(_._1) == Seq("acme:1", "acme:3", "acme:2"),
      s"scoped hits must come from ONE partition, rank order: $acme")
    assert(zeta.map(_._1) == Seq("zeta:1"))
    // same text, different corpus stats: in zeta (n=1) every term's
    // idf is the single-doc value; acme's 'hash' (df 3 of 3) is
    // discounted — the scores must NOT be equal
    assert(math.abs(acme.head._2 - zeta.head._2) > 1e-9,
      s"partition-local stats must differ: acme=${acme.head._2} " +
        s"zeta=${zeta.head._2}")
    // a partition with no docs is the empty response, not an error
    assert(TextSearch.searchPartitioned(spark, path, "ghost",
      Seq("hash"), 10).isEmpty)
    // partition keys validate like stored ids
    intercept[IllegalArgumentException] {
      TextSearch.searchPartitioned(spark, path, "_sys", Seq("hash"), 10)
    }
    // family separation, both directions
    val global = intercept[IllegalArgumentException] {
      TextSearch.searchIndexed(spark, path, Seq("hash"), 10)
    }
    assert(global.getMessage.contains("PARTITIONED"))
    val gPath = Files.createTempDirectory("graft-psearch-g").toString + "/idx"
    TextSearch.buildTextIndex(tiny.withColumn("doc_id", lit(1L)),
      $"doc_id", $"text", gPath, nBuckets = 4)
    val scoped = intercept[IllegalArgumentException] {
      TextSearch.searchPartitioned(spark, gPath, "acme", Seq("hash"), 10)
    }
    assert(scoped.getMessage.contains("GLOBAL"))
    // a malformed partitioned id fails the BUILD, not the query
    intercept[Exception] {
      TextSearch.buildPartitionedTextIndex(
        Seq(("noseparator", "some text")).toDF("doc_id", "text"),
        $"doc_id", $"text",
        Files.createTempDirectory("graft-psearch-bad").toString + "/idx")
    }
    // scale guard: the scoped serve lists ONLY the partition's probed
    // dirs — one _p directory, ≤2 _tb buckets for 2 terms
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = TextSearch.searchPartitioned(spark, path, "acme",
        Seq("hash", "join"), 10)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      val postings = scans.filter(_.metadata("Location").contains("postings"))
      assert(postings.nonEmpty, "expected a postings scan")
      assert(postings.head.partitionFilters.nonEmpty,
        "expected _p/_tb partition filters on the postings scan")
      val files = postings.head.metrics("numFiles").value
      assert(files >= 1 && files <= 2,
        s"expected <=2 probed files from ONE partition, got $files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("partitioned upsert: maintained == rebuilt, untouched partitions keep their bytes") {
    val base = Seq(
      ("acme:1", "hash join alpha"),
      ("acme:2", "hash beta gamma"),
      ("acme:3", "hash delta"),
      ("zeta:1", "hash join alpha"),
      ("zeta:2", "join epsilon"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-pups").toString
    val path = s"$dir/idx"
    TextSearch.buildPartitionedTextIndex(base, $"doc_id", $"text", path,
      nBuckets = 4)
    def snap(sub: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/$sub"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val zetaBefore = snap("postings").view
      .filterKeys(_.contains("_p=zeta")).toMap
    // one batch: change acme:1, delete acme:3, insert acme:4 and a
    // doc in a BRAND-NEW partition
    val delta = Seq(
      ("acme:1", "join join omega"),
      ("acme:4", "hash zeta fresh"),
      ("newp:1", "hash hash newpart"))
      .toDF("doc_id", "text")
    TextSearch.upsertPartitionedTextDocs(spark, path, delta,
      $"doc_id", $"text", deletedIds = Seq("acme:3"), newSeq = 2L)
    // the ground truth: a fresh build over the modified corpus
    val modified = base.filter($"doc_id" =!= "acme:1" &&
        $"doc_id" =!= "acme:3")
      .unionByName(delta)
    val path2 = s"$dir/idx2"
    TextSearch.buildPartitionedTextIndex(modified, $"doc_id", $"text",
      path2, nBuckets = 4)
    for (p <- Seq("acme", "zeta", "newp")) {
      val got = TextSearch.searchPartitioned(spark, path, p,
          Seq("hash", "join"), 10)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val want = TextSearch.searchPartitioned(spark, path2, p,
          Seq("hash", "join"), 10)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == want,
        s"maintained '$p' must serve the rebuild: $got vs $want")
    }
    // a deleted doc is gone, the new partition serves
    assert(!TextSearch.searchPartitioned(spark, path, "acme",
      Seq("hash", "join"), 10).collect().map(_.getString(0))
      .contains("acme:3"))
    assert(TextSearch.searchPartitioned(spark, path, "newp",
      Seq("hash"), 10).count() == 1)
    // zeta changed nothing: its postings bytes never moved
    val zetaAfter = snap("postings").view
      .filterKeys(_.contains("_p=zeta")).toMap
    assert(zetaAfter == zetaBefore,
      "untouched partition dirs must keep their bytes")
  }

  test("searchHighlights: earliest-N hit windows, clamped, terms wrapped") {
    val tiny = Seq(
      (1L, "alpha hash beta gamma hash"),
      (2L, "hash at start only"),
      (3L, "nothing relevant here"))
      .toDF("doc_id", "text")
    val path = Files.createTempDirectory("graft-hl").toString + "/idx"
    TextSearch.buildTextIndex(tiny, $"doc_id", $"text", path, nBuckets = 4)
    val got = TextSearch.searchHighlights(spark, path, Seq("hash"), tiny,
        "doc_id", "text", k = 10, fragSize = 1, number = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
      .toSeq
    // doc 1 (tf 2) ranks first: windows around positions 1 and 4,
    // the second clamped at the document end; doc 2 clamps at start
    assert(got == Seq(
      (1L, 0, "alpha <em>hash</em> beta"),
      (1L, 1, "gamma <em>hash</em>"),
      (2L, 0, "<em>hash</em> at")),
      s"highlights wrong: $got")
    // number=1 keeps only each doc's earliest window
    val one = TextSearch.searchHighlights(spark, path, Seq("hash"), tiny,
        "doc_id", "text", k = 10, fragSize = 0, number = 1)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(one == Seq((1L, "<em>hash</em>"), (2L, "<em>hash</em>")))
  }

  test("searchAnalyze + analyzeCorpus: full pipeline, post-stopword positions") {
    import TextSearch.Analyzer
    val an = Analyzer(stopwords = Seq("the", "and"), stem = true)
    // "the" and "and" drop BEFORE positions assign; stems apply after
    val got = TextSearch.searchAnalyze(spark,
        "The Ties and Parties value Cookies of batches", an)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((0, "ty"), (1, "party"), (2, "value"),
      (3, "cooky"), (4, "of"), (5, "batche")),
      s"analyze pipeline wrong: $got")
    // default analyzer is exactly Text.tokens: no stop, no stem
    val plain = TextSearch.searchAnalyze(spark, "The Ties And")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(plain == Seq((0, "the"), (1, "ties"), (2, "and")))
    // corpus form agrees with the endpoint row for row
    val docs = Seq((7L, "The Ties and Parties value Cookies of batches"))
      .toDF("doc_id", "text")
    val corp = TextSearch.analyzeCorpus(docs, $"doc_id", $"text", an)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(corp == got, s"corpus form diverged: $corp vs $got")
  }
}
