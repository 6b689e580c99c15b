package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.gfunctions.round4

/** Text-analysis functions for large-scale training-data pipelines.
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * no UDFs in any per-row path — and expressed so the same formula is
  * writable in ANSI-ish SQL for the correctness oracle. */
object Text {

  /** Tiny per-language stopword lists for the n-gram/stopword-hit
    * language-ID heuristic. Word-boundary regex hits; ASCII \b semantics
    * are identical across Java regex and RE2. */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "una", "por"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Whitespace tokens of the lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w =!= lit(""))

  /** Case-preserving variant of [[tokens]] (for
    * `TextSearch.Analyzer(lowercase = false)` indexes). */
  def tokensCased(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def langHits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"))
      .cast("long")

  /** Stopword-hit language ID with deterministic earlier-language
    * tie-break (en > de > fr > es > zh). */
  def langId(text: Column): Column = {
    val h = langWords.map { case (l, ws) => (l, langHits(text, ws)) }
    when(h(0)._2 >= h(1)._2 && h(0)._2 >= h(2)._2 &&
         h(0)._2 >= h(3)._2 && h(0)._2 >= h(4)._2, h(0)._1)
      .when(h(1)._2 >= h(2)._2 && h(1)._2 >= h(3)._2 && h(1)._2 >= h(4)._2,
        h(1)._1)
      .when(h(2)._2 >= h(3)._2 && h(2)._2 >= h(4)._2, h(2)._1)
      .when(h(3)._2 >= h(4)._2, h(3)._1)
      .otherwise(h(4)._1)
  }

  /** The character-n-gram language model: per language, a literal
    * table of (pattern, integer weight) — function words carried
    * space-delimited, sub-word character n-grams bare, plus the CJK
    * codepoint class for zh. Patterns are regex-safe literals (and one
    * explicit class), counted non-overlapping left-to-right — the rule
    * both engines share — over `' ' || lower(text) || ' '`. Integer
    * weights on long counts keep every score EXACT (no float argmax
    * boundary), the E17 classifier discipline. */
  val langNgrams: Seq[(String, Seq[(String, Long)])] = Seq(
    "en" -> Seq(" the " -> 3L, " a " -> 1L, " of " -> 2L, " to " -> 2L,
      " in " -> 2L, " and " -> 2L, "th" -> 1L, "ing " -> 2L),
    "de" -> Seq(" der " -> 3L, " die " -> 3L, " und " -> 3L, " ist " -> 2L,
      " das " -> 2L, " nicht " -> 2L, "sch" -> 2L, "ung " -> 2L),
    "fr" -> Seq(" le " -> 2L, " la " -> 2L, " les " -> 3L, " des " -> 3L,
      " et " -> 2L, " est " -> 2L, "é" -> 2L, "è" -> 2L),
    "es" -> Seq(" el " -> 3L, " los " -> 3L, " las " -> 3L, " y " -> 2L,
      " es " -> 2L, "ñ" -> 3L, "ción" -> 3L, "ado " -> 2L),
    "zh" -> Seq("[一-龥]" -> 1L))

  /** Per-language n-gram scores + argmax prediction — E2's
    * character-n-gram upgrade (the fastText-style shape at literal
    * scale: no trained file, a declared weight table; swap in learned
    * weights without touching the plan). One codegen projection: the
    * feature counts are `regexp_count` over the padded text, the score
    * a fixed integer dot product, the argmax the same earlier-language
    * tie-break CASE chain as [[langId]] — everything replays in SQL
    * (q161). Feed [[qualityFilter]]'s `lang` hook with
    * [[langIdNgram]] to gate on it. */
  def langNgramScores(docs: org.apache.spark.sql.DataFrame,
                      id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    val s = concat(lit(" "), lower(text), lit(" "))
    val scores = langNgrams.map { case (l, gs) =>
      l -> gs.map { case (g, w) =>
        regexp_count(s, lit(g)).cast("long") * lit(w)
      }.reduce(_ + _)
    }
    docs.select((id.cast("long").as("doc_id") +:
        scores.map { case (l, c) => c.as(s"s_$l") }): _*)
      .withColumn("pred", argmaxLang(scores.map {
        case (l, _) => l -> col(s"s_$l")
      }))
  }

  /** The n-gram prediction as one Column (for `qualityFilter(lang =
    * Some(...))` and inline use). */
  def langIdNgram(text: Column): Column = {
    val s = concat(lit(" "), lower(text), lit(" "))
    argmaxLang(langNgrams.map { case (l, gs) =>
      l -> gs.map { case (g, w) =>
        regexp_count(s, lit(g)).cast("long") * lit(w)
      }.reduce(_ + _)
    })
  }

  /** Deterministic argmax with earlier-language tie-break (the
    * [[langId]] rule). */
  private def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val h = scores.toIndexedSeq
    when(h(0)._2 >= h(1)._2 && h(0)._2 >= h(2)._2 &&
         h(0)._2 >= h(3)._2 && h(0)._2 >= h(4)._2, h(0)._1)
      .when(h(1)._2 >= h(2)._2 && h(1)._2 >= h(3)._2 && h(1)._2 >= h(4)._2,
        h(1)._1)
      .when(h(2)._2 >= h(3)._2 && h(2)._2 >= h(4)._2, h(2)._1)
      .when(h(3)._2 >= h(4)._2, h(3)._1)
      .otherwise(h(4)._1)
  }

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]")).cast("long")

  /** Composite quality score in [0,1]: length, punctuation-density and
    * stopword-density components. Formula kept to a fixed
    * left-associated expression tree so both engines produce
    * bit-identical doubles before the final round. */
  def qualityScore(text: Column): Column = {
    val tok = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val punct = punctCount(text).cast("double")
    val stops = langHits(text, langWords.head._2).cast("double")
    round4(
      least(lit(1.0), tok / 50.0) * 0.4 +
      (lit(1.0) - least(lit(1.0), punct / greatest(chars, lit(1.0)) * 10.0)) * 0.3 +
      least(lit(1.0), stops / greatest(tok, lit(1.0)) * 5.0) * 0.3)
  }

  /** `(doc_id, _p, _w)` positional token rows — the shared tokenized
    * frame behind [[bigramRows]] and [[repetitionScores]]. */
  private def tokenRows(docs: org.apache.spark.sql.DataFrame,
                        id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs.select(id.cast("long").as("doc_id"), text.as("_t"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), posexplode(tokens(col("_t"))).as(Seq("_p", "_w")))
  }

  /** `(doc_id, w1, w2)` adjacent-token bigram rows from an already-
    * tokenized [[tokenRows]] frame — the shared front of
    * [[bigramLmScores]], [[pmiBigrams]] and [[repetitionScores]]: one
    * lead window per doc. */
  private def bigramsOf(toks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_p"))
    toks
      .select(col("doc_id"), col("_w").as("w1"),
        lead(col("_w"), 1).over(w).as("w2"))
      .filter(col("w2").isNotNull)
  }

  private def bigramRows(docs: org.apache.spark.sql.DataFrame,
                         id: Column, text: Column)
      : org.apache.spark.sql.DataFrame =
    bigramsOf(tokenRows(docs, id, text))

  /** Bigram language-model quality score — the CCNet/Gopher-style LM
    * filter for training-data pipelines: an add-one-smoothed bigram
    * model is "trained" on the corpus itself (two aggregations: bigram
    * counts and unigram counts), and each doc is scored by its average
    * bigram log-probability `avg ln((c2+1)/(c1+V))` — formulaic text
    * (repeated high-probability transitions) scores high, token salad
    * scores low.
    *
    * Engine-portable by construction: each bigram's log-prob is
    * rounded at 1e-6 and summed as an INTEGER (order-free exact adds —
    * a plain double sum over an unordered group would be
    * nondeterministic in the last ulp), divided back once per doc.
    * Scale shape: one explode + lead window for bigram rows, two
    * partial-aggregating groupBys for the model, one broadcast-or-
    * shuffle join to score — never a per-doc loop. Returns
    * `(doc_id, n_bigrams, lm_score)` for docs with ≥1 bigram. */
  def bigramLmScores(docs: org.apache.spark.sql.DataFrame,
                     id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val bi = bigramRows(docs, id, text)
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(fcount(lit(1)).as("c2"))
    // NO broadcast hint on the unigram (or bigram) model joins: both
    // tables are one row per distinct corpus token/bigram — unbounded
    // at corpus scale (hundreds of millions of rows at 100 TB), so a
    // forced broadcast would OOM outright. AQE picks broadcast at
    // runtime whenever the model actually fits.
    val c1 = bi.groupBy(col("w1")).agg(fcount(lit(1)).as("c1"))
    // vocabulary size as a one-row frame fused into the scoring plan
    // (one job), not a separate driver-side count() action (two jobs)
    val vdf = bi.select(col("w1")).unionByName(bi.select(col("w2").as("w1")))
      .distinct().agg(fcount(lit(1)).cast("double").as("_v"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vdf))
      .withColumn("_lp6", floor(log(
        (col("c2").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("_v"))) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(fcount(lit(1)).as("n_bigrams"), sum(col("_lp6")).as("_s6"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.gfunctions.round4((col("_s6").cast("double") / 1000000.0) /
          col("n_bigrams")).as("lm_score"))
  }

  /** Interpolated KNESER-NEY bigram LM score (Kneser & Ney 1995; the
    * interpolated form of Chen & Goodman 1999, fixed discount
    * D = 0.75) — the standard upgrade over [[bigramLmScores]]'
    * add-one smoothing:
    *
    *   P(w2|w1) = (c(w1w2) − D)/c(w1)
    *            + (D · N1+(w1·)/c(w1)) · N1+(·w2)/T
    *
    * where N1+(w1·) = distinct continuations of w1 (how much
    * probability mass w1 lends to the backoff), N1+(·w2) = distinct
    * histories of w2 (the CONTINUATION probability — how
    * promiscuously a word enters new contexts, not how often it
    * occurs: "Francisco" is frequent but follows only "San", so KN
    * scores it low in novel contexts), and T = distinct bigram
    * types. Scored on the training corpus every c ≥ 1 > D, so the
    * discounted term never clamps.
    *
    * Scale shape: the [[bigramLmScores]] discipline — three
    * partial-aggregated groupBys over the bigram rows (counts,
    * continuation fan-outs, one-row type total), model joins
    * AQE-sized (NO broadcast hint: the model is one row per distinct
    * bigram/token, unbounded at 100 TB), per-doc score = avg ln P
    * summed in the order-free integer micro-nat fixed point.
    * Returns `(doc_id, n_bigrams, kn_score)` for docs with ≥ 1
    * bigram. */
  def knBigramLmScores(docs: org.apache.spark.sql.DataFrame,
                       id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val bi = bigramRows(docs, id, text)
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(fcount(lit(1)).as("c2"))
    val c1 = bi.groupBy(col("w1")).agg(fcount(lit(1)).as("c1"))
    val fan = c2.groupBy(col("w1")).agg(fcount(lit(1)).as("n1f"))
    val hist = c2.groupBy(col("w2")).agg(fcount(lit(1)).as("n1p"))
    val tdf = c2.agg(fcount(lit(1)).cast("double").as("_t"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .join(fan, Seq("w1")).join(hist, Seq("w2"))
      .crossJoin(broadcast(tdf))
      .withColumn("_p",
        (col("c2").cast("double") - lit(0.75)) /
          col("c1").cast("double") +
        (lit(0.75) * col("n1f").cast("double") /
          col("c1").cast("double")) *
          (col("n1p").cast("double") / col("_t")))
      .withColumn("_lp6",
        floor(log(col("_p")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(fcount(lit(1)).as("n_bigrams"), sum(col("_lp6")).as("_s6"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.gfunctions.round4(
          (col("_s6").cast("double") / 1000000.0) / col("n_bigrams"))
          .as("kn_score"))
  }

  /** CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" — the head/middle/tail split every CommonCrawl pipeline
    * runs): score each doc with the corpus-trained bigram LM
    * ([[bigramLmScores]]; `lm_score` is the avg bigram log-prob, so
    * perplexity `exp(−lm_score)` is its monotone inverse — ordering
    * by `lm_score` DESC is ordering by perplexity ASC) and cut the
    * corpus into exact thirds: `head` (lowest perplexity — CCNet
    * keeps), `middle` (mixes), `tail` (drops).
    *
    * The cut is EXACT and scale-safe: one [[graft.operators
    * .Relational.withGlobalRowNumber]] two-phase range-partitioned
    * rank over `(lm_score DESC, doc_id)` (never a single-partition
    * window), then rank r of n lands in head iff `3r ≤ n`, middle iff
    * `3r ≤ 2n` — integer arithmetic, ±0 rows, deterministic under the
    * doc-id tiebreak, engine-replayable. Returns
    * `(doc_id, n_bigrams, lm_score, ppl_bucket)` for docs with ≥ 1
    * bigram. */
  def perplexityBuckets(docs: org.apache.spark.sql.DataFrame,
                        id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    val scored = bigramLmScores(docs, id, text)
    val ranked = Relational.withGlobalRowNumber(scored,
      Seq(col("lm_score").desc, col("doc_id")), "_gr")
    val n = scored.agg(fcount(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"),
        when(col("_gr") * 3 <= col("_n"), lit("head"))
          .when(col("_gr") * 3 <= col("_n") * 2, lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Trigram language-model quality score with STUPID BACKOFF — the
    * higher-order upgrade of [[bigramLmScores]] a CCNet-grade filter
    * uses. The model is trained on the corpus itself and PRUNED at
    * `minCount` (real n-gram models drop rare counts for size — and
    * the pruning is what makes backoff live when scoring the training
    * corpus, where every observed trigram otherwise has count ≥ 1):
    *
    *   S(w3|w1w2) = c3/c(w1w2)            if c3 ≥ minCount
    *              = α · S(w3|w2)          otherwise
    *   S(w3|w2)   = c(w2w3)/c(w2)         if c(w2w3) ≥ minCount
    *              = α · c(w3)/N           otherwise
    *
    * (Brants et al. 2007's score, α = 0.4 conventionally; contexts
    * from the plain corpus bigram/unigram tables, N = corpus tokens.)
    * Per-doc score = avg ln S over the doc's trigrams, in the same
    * integer micro-nat fixed point as [[bigramLmScores]] (each
    * trigram's ln rounded at 1e-6 and summed as a long — order-free
    * exact adds), divided back once per doc.
    *
    * Scale shape: scores are computed per trigram TYPE (the c3 table
    * joins the context/backoff tables at type grain, far smaller than
    * occurrence grain), then one join scores occurrences; no broadcast
    * hints anywhere — every model table is unbounded at corpus scale
    * (the q74/bigram lesson), AQE picks broadcast when one fits.
    * Returns `(doc_id, n_trigrams, lm3_score)` for docs with ≥ 1
    * trigram. */
  def trigramLmScores(docs: org.apache.spark.sql.DataFrame,
                      id: Column, text: Column, minCount: Long = 2L,
                      alpha: Double = 0.4)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    import org.apache.spark.sql.expressions.Window
    require(minCount >= 1, "minCount must be >= 1")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val toks = tokenRows(docs, id, text)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_p"))
    val tri = toks.select(col("doc_id"), col("_w").as("w1"),
        lead(col("_w"), 1).over(w).as("w2"),
        lead(col("_w"), 2).over(w).as("w3"))
      .filter(col("w3").isNotNull)
    val c3 = tri.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(fcount(lit(1)).as("c3"))
    val bi = bigramsOf(toks)
    val cb = bi.groupBy(col("w1"), col("w2")).agg(fcount(lit(1)).as("cb"))
    val c1 = toks.groupBy(col("_w")).agg(fcount(lit(1)).as("c1"))
    val nt = toks.agg(fcount(lit(1)).cast("double").as("_n"))
    // per-TYPE stupid-backoff score: every join at n-gram-type grain
    val typed = c3
      .join(cb, Seq("w1", "w2")) // context always exists (prefix of c3)
      .join(cb.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cb").as("c23")), Seq("w2", "w3"))
      .join(c1.select(col("_w").as("w2"), col("c1").as("c1_2")), Seq("w2"))
      .join(c1.select(col("_w").as("w3"), col("c1").as("c1_3")), Seq("w3"))
      .crossJoin(broadcast(nt))
      .select(col("w1"), col("w2"), col("w3"),
        floor(log(
          when(col("c3") >= minCount,
            col("c3").cast("double") / col("cb").cast("double"))
          .when(col("c23") >= minCount, lit(alpha) *
            (col("c23").cast("double") / col("c1_2").cast("double")))
          .otherwise(lit(alpha) * lit(alpha) *
            (col("c1_3").cast("double") / col("_n")))) *
          lit(1000000.0) + lit(0.5)).cast("long").as("_lp6"))
    tri.join(typed, Seq("w1", "w2", "w3"))
      .groupBy(col("doc_id"))
      .agg(fcount(lit(1)).as("n_trigrams"), sum(col("_lp6")).as("_s6"))
      .select(col("doc_id"), col("n_trigrams"),
        graft.gfunctions.round4((col("_s6").cast("double") / 1000000.0) /
          col("n_trigrams")).as("lm3_score"))
  }

  /** PMI-ranked bigram collocations — phrase-vocabulary mining for
    * training-data pipelines (tokenizer merge candidates, stop-phrase
    * lists): `pmi(w1,w2) = ln(P(w1,w2) / (P(w1)·P(w2)))` over the
    * corpus bigram table, with the unigram marginals counted as
    * left/right bigram positions. `minCount` suppresses the classic
    * PMI rare-pair blowup. Per-pair cost is one scalar expression (no
    * unordered float sums — the counts are exact integers), so the
    * ranking replays in the oracle engine; doubles throughout the
    * ratio so counts at 100 TB never overflow an integer product.
    * Returns the top-`k` `(w1, w2, c2, pmi)` by rounded PMI, ties by
    * the pair. */
  def pmiBigrams(docs: org.apache.spark.sql.DataFrame,
                 id: Column, text: Column, minCount: Long = 5L,
                 k: Int = 25): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count => fcount}
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val bi = bigramRows(docs, id, text)
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(fcount(lit(1)).as("c2"))
    // marginals from the bigram table's own positions (each bigram
    // occurrence contributes one left and one right observation)
    val cl = bi.groupBy(col("w1")).agg(fcount(lit(1)).as("_cl"))
    val cr = bi.groupBy(col("w2")).agg(fcount(lit(1)).as("_cr"))
    val nt = bi.agg(fcount(lit(1)).cast("double").as("_n"))
    c2.filter(col("c2") >= minCount)
      .join(cl, Seq("w1")).join(cr, Seq("w2"))
      .crossJoin(broadcast(nt))
      .select(col("w1"), col("w2"), col("c2"),
        round4(log((col("c2").cast("double") * col("_n")) /
          (col("_cl").cast("double") * col("_cr").cast("double"))))
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc).limit(k)
  }

  /** Gopher-style repetition signals — the "repetitive junk" filters
    * that complement [[qualityScore]] (surface heuristics) and
    * [[bigramLmScores]] (LM signal): per doc,
    *  - `dup_token_frac` = 1 - distinct_tokens/tokens (near 1 ⇒ the
    *    same few tokens looped);
    *  - `top_bigram_frac` = occurrences of the doc's most frequent
    *    bigram / total bigrams (near 1 ⇒ one phrase repeated).
    * Both are exact integer-count ratios divided once per doc (no
    * unordered float sums) and rounded for the gate; docs need ≥1
    * bigram. Cost: one explode + two partial aggregations — never a
    * per-doc loop. */
  def repetitionScores(docs: org.apache.spark.sql.DataFrame,
                       id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount}
    // ONE tokenize pass feeds both statistics (token- and bigram-side)
    val toks = tokenRows(docs, id, text)
    val tokStats = toks.groupBy(col("doc_id"))
      .agg(fcount(lit(1)).as("_ntok"),
        count_distinct(col("_w")).as("_dtok"))
    val biStats = bigramsOf(toks)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(fcount(lit(1)).as("_c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_c")).as("_nbi"), max(col("_c")).as("_maxbi"))
    biStats.join(tokStats, Seq("doc_id"))
      .select(col("doc_id"),
        round4(lit(1.0) - col("_dtok").cast("double") /
          col("_ntok").cast("double")).as("dup_token_frac"),
        round4(col("_maxbi").cast("double") /
          col("_nbi").cast("double")).as("top_bigram_frac"))
  }

  /** Whitespace-normalized lowercase form used for content hashing. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (identical builtin
    * in the oracle engine). */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Winnowing document fingerprints as (doc_id, fp) rows: md5 hex over
    * character k-grams, then the minimum of each sliding window of `w`
    * hashes, de-duplicated per document. md5 hex strings compare
    * bytewise-lexicographically the same in every engine ([0-9a-f]
    * ASCII), so the window minimum — and therefore the fingerprint set —
    * is engine-portable and DuckDB-oracle-gated.
    *
    * Rows + window-min formulation, NOT nested array lambdas: Spark
    * higher-order functions evaluate interpreted per element and would
    * re-evaluate the gram array per window — O(chars²) per document
    * (see SURVEY.md §6). */
  def winnowRows(docs: org.apache.spark.sql.DataFrame,
                 id: Column, text: Column,
                 k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    val base = docs
      .select(id.cast("long").as("doc_id"), normalize(text).as("_n"))
      .repartition(parts, col("doc_id"))
    val grams = base.select(col("doc_id"),
        posexplode(sequence(lit(1),
          greatest(length(col("_n")) - (k - 1), lit(1)))).as(Seq("_i", "_p")),
        col("_n"))
      .select(col("doc_id"), col("_p"),
        md5(col("_n").substr(col("_p"), lit(k)).cast("binary")).as("_h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("_p"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("fp", min(col("_h")).over(win))
      .withColumn("_wc", count(col("_h")).over(win))
      .withColumn("_tot", count(col("_h")).over(
        Window.partitionBy(col("doc_id"))))
      // full windows only (winnowing proper); a doc with fewer than w
      // grams contributes its single global minimum
      .filter(col("_wc") === w || (col("_tot") < w && col("_p") === 1))
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** The composed QUALITY-FILTER verdict — the CCNet/Gopher-style
    * filter chain a training-data pipeline actually runs, with
    * per-document REASONS instead of a silent drop: token-count
    * bounds, the composite [[qualityScore]], language-ID membership,
    * and the two repetition statistics ([[repetitionScores]]).
    * Returns `(doc_id, keep, reasons)` where `reasons` is the
    * comma-joined list of failed checks in a FIXED order
    * (`too_short,too_long,low_quality,bad_lang,repetitive_tokens,
    * repetitive_bigrams`) and `keep = (reasons == "")` — auditable
    * and re-aggregatable (GROUP BY reasons is the pipeline's drop
    * report). Docs too short to have bigrams pass the repetition
    * checks vacuously (they fail `too_short` instead).
    *
    * Cost: the [[repetitionScores]] token/bigram aggregation (two
    * doc_id-shuffled aggregations off one tokenize pass) + a codegen'd
    * row map for everything else; one join on doc_id. */
  /** C4/Dolma LINE-LEVEL quality signals (Raffel et al. 2020 §2.2;
    * Dolma App. C; Gopher's doc-format rules) — the per-line facts the
    * pretraining filters threshold on, folded doc-wise in ONE pass of
    * pure higher-order column math (`split` → `trim` → `filter` →
    * `size`): no explode, no per-line rows, no UDF — a straight
    * codegen'd scan at any corpus size. Lines are newline-split,
    * trimmed, empties dropped. Counts (exact integers — thresholds
    * replay in any engine):
    *  - `term_punct_lines`: lines ending in `.` `!` `?` `"` but NOT
    *    in `...` (C4 keeps only terminal-punctuation lines; an
    *    ellipsis is not terminal);
    *  - `upper_lines`: all-caps lines (`upper(l) == l` with at least
    *    one cased character — headings/shouting);
    *  - `bullet_lines`: lines starting with `-` `*` `•` (Gopher drops
    *    docs that are mostly bullets);
    *  - `ellipsis_lines`: lines ending in `...` (Gopher's trailing-
    *    ellipsis rule). */
  def lineSignals(docs: org.apache.spark.sql.DataFrame, id: Column,
                  text: Column): org.apache.spark.sql.DataFrame = {
    val lines = lineArray(text)
    docs.select(id.cast("long").as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      lineCount(lines, l => substring(l, -1, 1).isin(".", "!", "?", "\"")
        && !l.endsWith("...")).as("term_punct_lines"),
      lineCount(lines, l => upper(l) === l && lower(l) =!= l)
        .as("upper_lines"),
      lineCount(lines, l => substring(l, 1, 1).isin("-", "*", "•"))
        .as("bullet_lines"),
      lineCount(lines, l => l.endsWith("...")).as("ellipsis_lines"))
  }

  /** Trimmed non-empty lines of `text`, as one array column. */
  private def lineArray(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  private def lineCount(lines: Column, p: Column => Column): Column =
    size(filter(lines, p)).cast("long")

  def qualityFilter(docs: org.apache.spark.sql.DataFrame, id: Column,
                    text: Column, minTokens: Long = 10,
                    maxTokens: Long = 100000, minQuality: Double = 0.3,
                    allowedLangs: Seq[String] =
                      langWords.map(_._1),
                    maxDupTokenFrac: Double = 1.0,
                    maxTopBigramFrac: Double = 1.0,
                    lang: Option[Column] = None,
                    /** Billing override for the min/max-token bounds
                      * (e.g. [[Bpe.tokenCount]] of the TEXT column) —
                      * length gates then match what a trainer bills.
                      * The quality/repetition stats stay word-based:
                      * they measure surface redundancy, not cost. */
                    tokenCountCol: Option[Column] = None,
                    /** C4/Dolma LINE-level rules ([[lineSignals]]),
                      * inactive at the defaults: a doc drops when its
                      * terminal-punctuation line fraction falls BELOW
                      * `minTermPunctFrac` (C4 §2.2), or its all-caps /
                      * bullet / trailing-ellipsis line fraction rises
                      * ABOVE the respective max (Dolma App. C, Gopher
                      * doc-format rules). Thresholds compare the exact
                      * integer line counts against `frac * n_lines` —
                      * one IEEE product, identical in any engine. */
                    minTermPunctFrac: Double = 0.0,
                    maxUpperLineFrac: Double = 1.0,
                    maxBulletLineFrac: Double = 1.0,
                    maxEllipsisLineFrac: Double = 1.0)
      : org.apache.spark.sql.DataFrame = {
    // `lang` overrides the [[langId]] heuristic with a trusted
    // metadata column (a stored classifier label) — the usual case in
    // a pipeline that already ran language ID upstream
    val lines = lineArray(text)
    val base = docs.select(id.cast("long").as("doc_id"), text.as("_text"),
      lang.getOrElse(langId(text)).as("_lang"),
      tokenCountCol.getOrElse(tokenCount(text)).cast("long").as("_ntok"),
      size(lines).cast("long").as("_nl"),
      lineCount(lines, l => substring(l, -1, 1).isin(".", "!", "?", "\"")
        && !l.endsWith("...")).as("_lterm"),
      lineCount(lines, l => upper(l) === l && lower(l) =!= l)
        .as("_lupper"),
      lineCount(lines, l => substring(l, 1, 1).isin("-", "*", "•"))
        .as("_lbullet"),
      lineCount(lines, l => l.endsWith("...")).as("_lellip"))
    val rep = repetitionScores(docs, id, text)
    val ntok = col("_ntok")
    val nl = col("_nl").cast("double")
    val reasons = concat_ws(",",
      when(ntok < minTokens, lit("too_short")),
      when(ntok > maxTokens, lit("too_long")),
      when(qualityScore(col("_text")) < minQuality, lit("low_quality")),
      when(!col("_lang").isin(allowedLangs: _*), lit("bad_lang")),
      when(coalesce(col("dup_token_frac"), lit(0.0)) > maxDupTokenFrac,
        lit("repetitive_tokens")),
      when(coalesce(col("top_bigram_frac"), lit(0.0)) > maxTopBigramFrac,
        lit("repetitive_bigrams")),
      when(col("_lterm") < nl * minTermPunctFrac,
        lit("no_terminal_punct")),
      when(col("_lupper") > nl * maxUpperLineFrac,
        lit("uppercase_lines")),
      when(col("_lbullet") > nl * maxBulletLineFrac,
        lit("bullet_lines")),
      when(col("_lellip") > nl * maxEllipsisLineFrac,
        lit("ellipsis_lines")))
    base.join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), (reasons === "").as("keep"),
        reasons.as("reasons"))
  }

  /** Default PII patterns for [[redactPii]]. Kept to constructs whose
    * semantics are identical between Java regex and RE2 (character
    * classes, bounded/greedy quantifiers, ASCII `\b`, `\d`) so the
    * redaction replays bit-for-bit in the DuckDB oracle and in any
    * RE2-based downstream validator. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d[\\d-]{6,}\\d"

  /** PII REDACTION — the scrub pass a training-data pipeline runs
    * before packing: emails, IPv4 addresses and phone-like digit runs
    * replaced by `<EMAIL>` / `<IP>` / `<PHONE>` placeholders, with
    * per-type match counts. Matching is STAGED — emails are counted
    * and redacted first, IPs on the email-redacted text, phones on the
    * email+IP-redacted text — so the counts always equal what the
    * returned `clean_text` actually replaced (an email's digit-dash
    * local part can never double-count as a phone).
    *
    * Pure codegen'd `regexp_extract_all`/`regexp_replace` row maps —
    * no shuffle, no UDF; scales as a straight scan at any corpus
    * size. */
  def redactPii(docs: org.apache.spark.sql.DataFrame, id: Column,
                text: Column, email: String = EmailPattern,
                ip: String = Ipv4Pattern, phone: String = PhonePattern)
      : org.apache.spark.sql.DataFrame = {
    val t0 = text
    val t1 = regexp_replace(t0, email, "<EMAIL>")
    val t2 = regexp_replace(t1, ip, "<IP>")
    docs.select(id.cast("long").as("doc_id"),
      size(regexp_extract_all(t0, lit(email), lit(0))).as("emails"),
      size(regexp_extract_all(t1, lit(ip), lit(0))).as("ips"),
      size(regexp_extract_all(t2, lit(phone), lit(0))).as("phones"),
      regexp_replace(t2, phone, "<PHONE>").as("clean_text"))
  }

  /** SEQUENCE PACKING — the concat-and-chunk step that turns a
    * tokenized corpus into fixed-length training sequences (the
    * GPT-style pack: documents are concatenated in a deterministic
    * order and the token stream is cut every `seqLen` tokens, so a
    * document may span sequence boundaries). `group` names the packing
    * shard — documents are concatenated in `id` order WITHIN a group,
    * groups pack independently in parallel.
    *
    * Returns one row per (document, sequence) overlap:
    * `(doc_id, grp, seq, seq_start, seq_end, tok_start, tok_end)` —
    * the doc's token slice `[tok_start, tok_end)` lands at
    * `[seq_start, seq_end)` of packed sequence `seq` of its group.
    * Zero-token docs pack nothing and emit no row.
    *
    * Scale shape: ONE shuffle (by group), a per-group running sum —
    * each group's prefix-sum is a sorted within-partition scan, so
    * `group` cardinality bounds parallelism; pick ≥ cluster cores
    * (a hash of the id is fine — packing order stays deterministic
    * per group). The boundary-span fan-out is `explode(sequence(…))`
    * over at most `len/seqLen + 1` windows per doc — codegen'd, no
    * join, no driver state. */
  def packSequences(docs: org.apache.spark.sql.DataFrame, id: Column,
                    text: Column, seqLen: Int, group: Column,
                    /** Billing override: a per-doc token-count Column
                      * (e.g. [[Bpe.tokenCount]]) replacing the
                      * whitespace count, so sequences cut at
                      * trainer-accurate token boundaries. */
                    tokenCount: Option[Column] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val base = docs.select(group.cast("long").as("grp"),
        id.cast("long").as("doc_id"),
        tokenCount.getOrElse(size(tokens(text)))
          .cast("long").as("_len"))
      .filter(col("_len") > 0)
    val w = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
    val L = lit(seqLen.toLong)
    base.withColumn("_off", sum(col("_len")).over(w) - col("_len"))
      .withColumn("seq", explode(sequence(
        expr(s"_off DIV $seqLen"),
        expr(s"(_off + _len - 1) DIV $seqLen"))))
      .select(col("doc_id"), col("grp"), col("seq"),
        (greatest(col("_off"), col("seq") * L) - col("seq") * L)
          .as("seq_start"),
        (least(col("_off") + col("_len"), (col("seq") + 1) * L)
          - col("seq") * L).as("seq_end"),
        greatest(col("seq") * L - col("_off"), lit(0L)).as("tok_start"),
        least(col("_len"), (col("seq") + 1) * L - col("_off"))
          .as("tok_end"))
  }

  /** Model-based quality classification — the "fasttext-style
    * classifier" stage of a pre-training pipeline (GPT-3's WebText
    * classifier, LLaMA's wiki-ref classifier), expressed as a logistic
    * model over the same interpretable features [[qualityScore]] uses,
    * with LITERAL pretrained weights (a stand-in coefficient vector; a
    * production model drops its weights into the same expression).
    *
    * Scale shape: a zero-shuffle, zero-join codegen'd map — every
    * feature and the sigmoid evaluate inline in the scan's projection
    * (100 TB cost = the read itself). Engine-portability: each feature
    * is rounded at 1e-4 BEFORE entering the fixed left-associated
    * linear term, so both engines exponentiate bit-identical inputs
    * (the q74 `ln` discipline applied to `exp`); the probability is
    * rounded at 1e-4 and `keep` thresholds the ROUNDED value.
    *
    * Returns `(doc_id, f_len, f_punct, f_stop, prob, keep)`. */
  def qualityModelScores(docs: org.apache.spark.sql.DataFrame,
                         id: Column, text: Column)
      : org.apache.spark.sql.DataFrame =
    qualityModelScores(docs, id, text, Array(-2.0, 2.5, 1.5, 2.0))

  /** [[qualityModelScores]] with an explicit weight vector
    * `(bias, wLen, wPunct, wStop)` — the slot a
    * [[fitQualityModel]]-trained (or externally trained) model drops
    * into; the scoring plan is the same zero-shuffle codegen map. */
  def qualityModelScores(docs: org.apache.spark.sql.DataFrame,
                         id: Column, text: Column,
                         weights: Array[Double])
      : org.apache.spark.sql.DataFrame = {
    require(weights.length == 4,
      "weights must be (bias, wLen, wPunct, wStop)")
    val (fLen, fPunct, fStop) = qualityModelFeatures(text)
    docs.select(id.cast("long").as("doc_id"),
        fLen.as("f_len"), fPunct.as("f_punct"), fStop.as("f_stop"))
      .withColumn("_z", lit(weights(0)) + col("f_len") * weights(1) +
        col("f_punct") * weights(2) + col("f_stop") * weights(3))
      .withColumn("prob", round4(lit(1.0) / (lit(1.0) + exp(-col("_z")))))
      .select(col("doc_id"), col("f_len"), col("f_punct"), col("f_stop"),
        col("prob"), (col("prob") >= 0.5).as("keep"))
  }

  /** The E17 feature triple `(f_len, f_punct, f_stop)` — shared by
    * scoring and training so the two can never drift. Each feature is
    * round4'd BEFORE entering any linear term (the engine-portability
    * discipline). */
  private def qualityModelFeatures(text: Column)
      : (Column, Column, Column) = {
    val tok = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val punct = punctCount(text).cast("double")
    val stops = langHits(text, langWords.head._2).cast("double")
    (round4(least(lit(1.0), tok / 50.0)),
      round4(lit(1.0) -
        least(lit(1.0), punct / greatest(chars, lit(1.0)) * 10.0)),
      round4(least(lit(1.0), stops / greatest(tok, lit(1.0)) * 5.0)))
  }

  /** Distributed logistic-regression FIT for the quality model — the
    * `Bpe.learnDistributed` discipline applied to E17's classifier:
    * full-batch gradient descent from ZERO weights, each epoch ONE
    * aggregation job over the corpus (per-epoch driver state = four
    * longs), returning `(bias, wLen, wPunct, wStop)` ready to drop
    * into [[qualityModelScores]]. `label` is 0/1 (castable to
    * double).
    *
    * Engine-portable / oracle-replayable by construction: the per-doc
    * gradient contribution `(round4(p) − y)·x_j` enters the sum as the
    * INTEGER `floor(1e6·(…) + 0.5)` (the q202 DSIR fixed-point
    * discipline — integer sums have no float addition-order
    * nondeterminism), and the weight update
    * `w_j − lr·((G_j/1e6)/n)` is a fixed IEEE expression over those
    * integers, so replaying the same epochs lands on bit-identical
    * weights in any engine.
    *
    * Scale shape: one narrow feature projection (reused across
    * epochs), `epochs` aggregation jobs each reducing to 4 longs —
    * fitting on 100 TB is `epochs` scans with partial aggregation and
    * nothing else; no weight broadcast (weights ride as plan
    * literals), no driver-side data. */
  def fitQualityModel(docs: org.apache.spark.sql.DataFrame, id: Column,
                      text: Column, label: Column, epochs: Int = 3,
                      lr: Double = 0.5): Array[Double] = {
    require(epochs >= 1 && epochs <= 50, "epochs must be in [1, 50]")
    val (fLen, fPunct, fStop) = qualityModelFeatures(text)
    val f = docs.select(fLen.as("f_len"), fPunct.as("f_punct"),
      fStop.as("f_stop"), label.cast("double").as("_y")).persist()
    try {
      val n = f.count().toDouble
      require(n > 0, "fitQualityModel: empty corpus")
      val w = Array(0.0, 0.0, 0.0, 0.0)
      def fixp(c: Column): Column =
        floor(c + lit(0.5)).cast("long")
      for (_ <- 1 to epochs) {
        val z = lit(w(0)) + col("f_len") * w(1) +
          col("f_punct") * w(2) + col("f_stop") * w(3)
        val r = round4(lit(1.0) / (lit(1.0) + exp(-z))) - col("_y")
        val g = f.agg(
          sum(fixp(lit(1e6) * r)),
          sum(fixp(lit(1e6) * r * col("f_len"))),
          sum(fixp(lit(1e6) * r * col("f_punct"))),
          sum(fixp(lit(1e6) * r * col("f_stop")))).head()
        for (j <- 0 to 3)
          w(j) = w(j) - lr * ((g.getLong(j).toDouble / 1e6) / n)
      }
      w
    } finally f.unpersist()
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every RAW
    * document by the log-likelihood ratio of its hashed-n-gram
    * features under the TARGET corpus' feature distribution vs the
    * raw corpus' own — the "does this look like my target domain"
    * selector a pretraining pipeline ranks crawl data with. Keep the
    * top mass (compose [[graft.operators.Relational.epochShuffle]] /
    * top-k) to resample toward the target.
    *
    * Engine-portable by construction, the [[graft.operators
    * .TextSearch.tfidfVectors]] discipline: features are word
    * `n`-grams ([[Dedup.shingleRows]] — short docs contribute their
    * whole text) routed into `nBuckets` hash buckets by the md5
    * bucket, and each bucket's Laplace-smoothed log-ratio weight
    * `ln((t_b+1)) + ln(R+B) − ln(r_b+1) − ln(T+B)` is rounded at 1e-6
    * and carried as an INTEGER, so per-doc scores are exact integer
    * sums — no float addition-order nondeterminism (`R`/`T` = total
    * raw/target features, `B` = `nBuckets`).
    *
    * Scale shape: two shingle passes (each one explode + one
    * groupBy), a weight table of `nBuckets` rows broadcast back, one
    * per-doc aggregation. Scoring 100 TB of crawl against a small
    * target corpus never shuffles more than the feature stream, and
    * the model itself is `nBuckets` longs. Returns
    * `(doc_id, n_feats, score)` — higher = more target-like. */
  def importanceScores(raw: org.apache.spark.sql.DataFrame, rawId: Column,
                       rawText: Column,
                       target: org.apache.spark.sql.DataFrame,
                       targetId: Column, targetText: Column,
                       n: Int = 2, nBuckets: Int = 1024)
      : org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536,
      "nBuckets must be in [2, 65536] (bucket id = 4 hex digits of md5)")
    def buckets(docs: org.apache.spark.sql.DataFrame, id: Column,
                text: Column): org.apache.spark.sql.DataFrame =
      Dedup.shingleRows(docs.select(id, text), id, text, n)
        .select(col("doc_id"),
          (conv(substring(md5(col("_s")), 1, 4), 16, 10).cast("long")
            % nBuckets).as("_b"))
    val rawB = buckets(raw, rawId, rawText)
    val tgtB = buckets(target, targetId, targetText)
    val rc = rawB.groupBy(col("_b")).agg(count(lit(1)).as("_r"))
    val tc = tgtB.groupBy(col("_b")).agg(count(lit(1)).as("_t"))
    val totals = rc.agg(sum(col("_r")).as("_rtot"))
      .crossJoin(tc.agg(sum(col("_t")).as("_ttot")))
    val b = lit(nBuckets.toLong)
    val w = rc.join(tc, Seq("_b"), "left").crossJoin(broadcast(totals))
      .select(col("_b"),
        round(lit(1e6) *
          (log(coalesce(col("_t"), lit(0L)) + lit(1L)) +
            log(col("_rtot") + b) -
            log(col("_r") + lit(1L)) -
            log(col("_ttot") + b)))
          .cast("long").as("_w"))
    rawB.join(broadcast(w), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("_w")).as("score"))
  }

  /** Dataset-card CORPUS PROFILE: the per-slice statistics every
    * training-data release publishes — document count, token and
    * character totals, longest document, mean tokens/doc — for every
    * ROLLUP slice of the grouping dimensions ((d1, d2), (d1), ())
    * in ONE partial-aggregated shuffle (Spark's Rollup operator: the
    * map side pre-combines all slice levels; never one job per
    * slice, never a second scan). Rolled-up levels label their
    * grouped-away dimensions `(all)` via `grouping_id` (so a real
    * `(all)` value cannot be confused with the total row). The mean
    * is the exact integer `tokens·1000 div docs` — no float division
    * whose 2^53 mantissa a 100 TB token sum overflows. Tokens are
    * the engine's standard whitespace tokenization ([[tokens]] — the
    * same expression every other text operator counts with). */
  def corpusProfile(docs: org.apache.spark.sql.DataFrame, text: Column,
                    dims: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    require(dims.nonEmpty, "corpusProfile needs at least one dimension")
    import org.apache.spark.sql.functions.{grouping_id, length, trim}
    val base = docs.select(dims.map(col) :+
      tokenCount(text).as("_nt") :+
      length(trim(text)).cast("long").as("_nc"): _*)
    val agg = base.rollup(dims.map(col): _*)
      .agg(grouping_id().as("_gid"),
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        sum(col("_nc")).as("n_chars"),
        max(col("_nt")).as("max_doc_tokens"))
    val k = dims.size
    val labeled = dims.zipWithIndex.map { case (d, i) =>
      when((col("_gid").bitwiseAND(lit(1L << (k - 1 - i)))) =!= 0,
        lit("(all)")).otherwise(col(d).cast("string")).as(d)
    }
    agg.select(labeled ++ Seq(col("n_docs"), col("n_tokens"),
      col("n_chars"), col("max_doc_tokens"),
      // `div`, not `/`: Divide on longs goes through double, whose
      // 2^53 mantissa a 100 TB-scale token sum overflows
      org.apache.spark.sql.functions
        .expr("(n_tokens * 1000L) div n_docs").as("avg_tokens_x1000")): _*)
  }

  /** Corpus SNAPSHOT DIFF — the dataset-versioning report between two
    * releases of the same corpus: which documents were `added`,
    * `removed`, `changed` (same id, different content — compared by
    * md5 of the text, never by shipping bodies through the shuffle),
    * or `unchanged`, with document and token totals per status
    * (tokens_before from snapshot A's text, tokens_after from B's) —
    * the "what moved between v1 and v2" audit a training-data release
    * publishes next to its dataset card. Returns one row per status
    * present, in status order:
    * `(status, n_docs, tokens_before, tokens_after)`.
    *
    * Shape for 100 TB: each side reduces to `(id, md5, token_count)`
    * BEFORE the join — the full-outer join (the irreducible step of
    * any diff) carries three narrow columns, not documents; the
    * status rollup after it is partial-aggregated. One shuffle per
    * side + the join, no window, no collect. */
  def corpusDiff(a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame,
                 id: Column, text: Column)
      : org.apache.spark.sql.DataFrame = {
    def side(df: org.apache.spark.sql.DataFrame, tag: String) =
      // null-safe hash: md5(NULL) is NULL, and a NULL _h on a PRESENT
      // row would masquerade as an absent side and misreport the doc
      // as added/removed — coalesce so hash-null always means "row
      // absent from this side"
      df.select(id.cast("long").as("_id"),
        md5(coalesce(text.cast("string"), lit(""))).as(s"_h$tag"),
        tokenCount(text).as(s"_t$tag"))
    val j = side(a, "a").join(side(b, "b"), Seq("_id"), "full_outer")
    val status = when(col("_ha").isNull, lit("added"))
      .when(col("_hb").isNull, lit("removed"))
      .when(col("_ha") === col("_hb"), lit("unchanged"))
      .otherwise(lit("changed"))
    j.select(status.as("status"),
        coalesce(col("_ta"), lit(0L)).as("_ta"),
        coalesce(col("_tb"), lit(0L)).as("_tb"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_ta")).as("tokens_before"),
        sum(col("_tb")).as("tokens_after"))
      .orderBy(col("status"))
  }

  /** Vocabulary COVERAGE CURVE — the tokenizer-design read every
    * vocab-size decision runs: for each cut `k`, what fraction of the
    * corpus's token OCCURRENCES do the `k` most frequent token types
    * cover? Types rank by `(count desc, token asc)` — the tie order
    * is total and engine-replayable, so the curve is deterministic.
    * Returns one row per requested `k` (ascending):
    * `(k, types_at_k, covered_tokens, coverage)` with `types_at_k =
    * min(k, distinct types)` and `coverage = covered/total` rounded
    * half-up at 1e-4 (the house ratio construction).
    *
    * Shape for 100 TB: ONE explode + partial-aggregated groupBy
    * builds the type table (types ≪ occurrences); the curve then
    * needs only the top `max(ks)` types, taken with a global
    * TakeOrdered (limit pushes into each partition — never a full
    * sort of the type table); the running sum windows over that
    * BOUNDED prefix (≤ max(ks) rows, one partition by construction,
    * not by accident). Total token count rides from the same type
    * table's sum — the corpus is scanned once. */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, text: Column,
                    ks: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      s"vocabCoverage: cuts must be positive, got $ks")
    require(ks.distinct == ks, s"vocabCoverage: duplicate cuts in $ks")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    // no repartition before the groupBy: an explicit exchange on _w
    // would run BEFORE the partial aggregate and ship every token
    // OCCURRENCE through the shuffle; left declarative, Catalyst
    // plans partial+final hash aggregation so the shuffle carries
    // per-partition (type, count) partials only (types ≪ occurrences)
    val types = docs.select(explode(tokens(text)).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_c"))
      .persist()
    try {
      val totalRow = types.agg(sum(col("_c"))).head()
      require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0,
        "vocabCoverage: corpus has no tokens")
      val total = totalRow.getLong(0)
      val top = types
        .orderBy(col("_c").desc, col("_w").asc)
        .limit(ks.max)
        .withColumn("_r", row_number().over(
          Window.orderBy(col("_c").desc, col("_w").asc)))
        .withColumn("_cum", sum(col("_c")).over(
          Window.orderBy(col("_r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("_r"), col("_cum"))
      val cuts = ks.sorted.map(k => (k, k.toLong))
      import spark.implicits._
      val kdf = cuts.toDF("k", "_kl")
      kdf.join(top, col("_r") <= col("_kl"))
        .groupBy(col("k"))
        .agg(max(col("_r")).as("types_at_k"),
          max(col("_cum")).as("covered_tokens"))
        .select(col("k"), col("types_at_k").cast("long").as("types_at_k"),
          col("covered_tokens"),
          graft.gfunctions.round4(col("covered_tokens").cast("double") /
            lit(total.toDouble)).as("coverage"))
        .orderBy(col("k"))
    } finally types.unpersist()
  }
}
