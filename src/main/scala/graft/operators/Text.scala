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

  /** Whitespace-normalized lowercase form used for content hashing. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (identical builtin
    * in the oracle engine). */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Winnowing document fingerprints: xxhash64 over character k-grams,
    * then the minimum of each sliding window of `w` hashes, de-duplicated.
    * Spark-only (xxhash64 is engine-specific) — covered by spec, not the
    * SQL oracle. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column = {
    val n = normalize(text)
    val count = greatest(length(n) - (k - 1), lit(1))
    val grams = transform(sequence(lit(1), count),
      i => xxhash64(n.substr(i, lit(k))))
    val windows = transform(sequence(lit(0), greatest(size(grams) - w, lit(0))),
      j => array_min(slice(grams, j + 1, lit(w))))
    array_distinct(windows)
  }
}
