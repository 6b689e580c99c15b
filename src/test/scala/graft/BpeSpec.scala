package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Text}

/** Byte-level BPE (round-6 verdict item 5): deterministic learn,
  * lossless segmentation, documented count bounds vs the whitespace
  * path, and the packing gate re-run under BPE billing. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", $"text")

  private lazy val bpe = Bpe.learn(docs, $"doc_id", $"text", nMerges = 256)

  test("learn is deterministic and produces a real merge table") {
    val again = Bpe.learn(docs, $"doc_id", $"text", nMerges = 256)
    assert(bpe.merges == again.merges, "merge table must be reproducible")
    assert(bpe.merges.nonEmpty && bpe.merges.size <= 256)
    assert(bpe.merges.distinct.size == bpe.merges.size, "no duplicate merges")
  }

  test("segmentation is lossless: tokens of a word concat to its bytes") {
    for (w <- Seq("the", "streaming", "hashjoin", "überschuß", "a")) {
      val syms = bpe.encodeWord(w)
      val bytes = w.getBytes("UTF-8")
        .map(b => (b & 0xff).toChar).mkString
      assert(syms.mkString == bytes, s"lossy segmentation of '$w': $syms")
    }
  }

  test("counts sit inside the documented whitespace..bytes envelope") {
    val rows = docs.select(
        Text.tokenCount($"text").as("ws"),
        bpe.tokenCount($"text").as("bp"),
        aggregate(transform(Text.tokens($"text"),
            w => octet_length(w).cast("long")),
          lit(0L), (a, x) => a + x).as("bytes"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((ws, bp, bytes) <- rows) {
      assert(ws <= bp, s"bpe count $bp below whitespace count $ws")
      assert(bp <= bytes, s"bpe count $bp above byte count $bytes")
    }
    // and the merges actually compress: corpus-wide bpe tokens must sit
    // well under raw bytes (a degenerate empty merge table would tie)
    val (totBp, totBytes) = rows.foldLeft((0L, 0L)) {
      case ((b, y), (_, bp, by)) => (b + bp, y + by) }
    assert(totBp < totBytes,
      s"merge table failed to compress: $totBp tokens vs $totBytes bytes")
  }

  test("packSequences under BPE billing keeps every packing invariant") {
    val L = 64
    val rows = Text.packSequences(docs, $"doc_id", $"text", L,
        group = $"doc_id" % 3,
        tokenCount = Some(bpe.tokenCount($"text")))
      .collect()
    val lens = docs.select($"doc_id",
        bpe.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    // full coverage in BPE tokens, slice arithmetic consistent
    val sliceLens = rows.map(r => r.getLong(4) - r.getLong(3))
    assert(sliceLens.sum == lens.values.filter(_ > 0).sum,
      "packed slices must cover every BPE token exactly once")
    assert(rows.forall(r =>
      r.getLong(4) - r.getLong(3) == r.getLong(6) - r.getLong(5)))
    // per-doc slices tile [0, len)
    for ((doc, rs) <- rows.groupBy(_.getLong(0))) {
      val spans = rs.map(r => (r.getLong(5), r.getLong(6))).sortBy(_._1)
      assert(spans.head._1 == 0L && spans.last._2 == lens(doc),
        s"doc $doc token range not tiled: $spans vs len ${lens(doc)}")
      assert(spans.sliding(2).forall {
        case Array((_, e), (s2, _)) => e == s2; case _ => true
      }, s"doc $doc has gaps: $spans")
    }
    // every non-final window of each group is exactly L tokens
    for (((grp, seq), rs) <- rows.groupBy(r => (r.getLong(1), r.getLong(2)))) {
      val maxSeq = rows.filter(_.getLong(1) == grp).map(_.getLong(2)).max
      if (seq < maxSeq)
        assert(rs.map(r => r.getLong(4) - r.getLong(3)).sum == L,
          s"non-final window grp $grp seq $seq not full")
    }
  }

  test("qualityFilter length gates bill in BPE tokens when asked") {
    // BPE counts exceed whitespace counts, so a BPE-billed min-token
    // gate passes docs the whitespace gate would reject
    val short = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val ws = Text.qualityFilter(short, $"doc_id", $"text",
      minTokens = 10, minQuality = 0.0, allowedLangs = Seq("en", "xx"),
      lang = Some(lit("xx")))
      .select($"keep", $"reasons").head()
    assert(!ws.getBoolean(0) && ws.getString(1).contains("too_short"))
    val bp = Text.qualityFilter(short, $"doc_id", $"text",
      minTokens = 10, minQuality = 0.0, allowedLangs = Seq("en", "xx"),
      lang = Some(lit("xx")),
      tokenCountCol = Some(bpe.tokenCount($"text")))
      .select($"keep", $"reasons").head()
    assert(bp.getBoolean(0),
      s"BPE billing (> 10 tokens here) must pass: ${bp.getString(1)}")
  }

  test("tokenCounts (type-grain billing) == per-row tokenCount, zero docs kept") {
    // count identity: the relational distinct-types path must bill
    // exactly what the per-row UDF path bills, doc by doc
    val perRow = docs.select($"doc_id", bpe.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    val typed = bpe.tokenCounts(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(typed.size == perRow.size)
    assert(typed == perRow, {
      val bad = typed.collect {
        case (d, n) if perRow(d) != n => (d, n, perRow(d))
      }.take(5)
      s"type-grain billing diverges: $bad"
    })
    // empty/whitespace/null docs bill 0, not disappear
    val edge = Seq((1L, "alpha beta"), (2L, "   "), (3L, null))
      .toDF("doc_id", "text")
    val got = bpe.tokenCounts(edge, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(got(2L) == 0L && got(3L) == 0L && got(1L) > 0L)
    // only DISTINCT word types reach the encode UDF: the udf input
    // relation is the vocabulary, asserted via the plan's aggregate
    // below the UDF projection (a corpus-sized UDF input would show
    // the udf directly over the exploded occurrences)
    val plan = bpe.tokenCounts(docs, $"doc_id", $"text")
      .queryExecution.optimizedPlan.toString()
    val udfAt = plan.linesIterator.indexWhere(_.contains("UDF"))
    assert(udfAt >= 0, s"expected the encode UDF in:\n$plan")
  }

  test("learnDistributed == driver learn on the same sample; full-corpus runs") {
    // path equivalence: one distributed groupBy per merge round must
    // reproduce the driver loop's merge table EXACTLY — same pair
    // counts, same (-count, a, b) tie-breaks, same early stop
    val driver = Bpe.learn(docs, $"doc_id", $"text",
      nMerges = 32, sampleDocs = 120)
    val dist = Bpe.learnDistributed(docs, $"doc_id", $"text",
      nMerges = 32, sampleDocs = Some(120))
    assert(dist.merges == driver.merges,
      s"tables diverge at ${dist.merges.zip(driver.merges)
        .indexWhere(p => p._1 != p._2)}: " +
        s"${dist.merges.take(8)} vs ${driver.merges.take(8)}")
    // full-corpus training (no sample) is deterministic and its table
    // bills every doc (the scale path: nothing corpus-sized collects)
    val full = Bpe.learnDistributed(docs, $"doc_id", $"text", nMerges = 8)
    assert(full.merges.size == 8)
    assert(Bpe.learnDistributed(docs, $"doc_id", $"text", nMerges = 8)
      .merges == full.merges)
    val n = full.tokenCounts(docs, $"doc_id", $"text")
      .agg(sum($"bpe_tokens")).head().getLong(0)
    assert(n > 0L)
  }
}
