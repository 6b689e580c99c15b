package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. The cardinal rule at
  * 100 TB: never materialize O(n²) — exact dedup is a hash groupBy,
  * near-dup goes shingle → MinHash signature → LSH band buckets →
  * within-bucket candidate pairs only. All signature math is md5-based
  * builtin-function composition (codegen'd, and replicable in the oracle
  * engine); nothing leaves whole-stage codegen. */
object Dedup {

  /** Exact dedup groups: content hash → (kept id = min, duplicate count).
    * One shuffle on the hash; partial aggregation map-side. */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(Text.fingerprint(text).as("fp"))
      .agg(min(id).cast("long").as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of the normalized text; documents shorter than
    * `n` words contribute their whole text as a single shingle. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val ws = Text.tokens(text)
    when(size(ws) < n, array(concat_ws(" ", ws)))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ",
          (0 until n).map(o => element_at(ws, i + o + 1)): _*)))
  }

  /** MinHash signature: k independent permutations simulated by seeded
    * md5; the signature element is the minimum digest string over the
    * shingle set. String-min avoids any hex→int conversion and is
    * bit-identical in the oracle engine. */
  def minhashSig(text: Column, k: Int = 8, shingleN: Int = 3): Column = {
    val sh = wordShingles(text, shingleN)
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh,
        s => md5(concat(i.cast("string"), lit("|"), s).cast("binary")))))
  }

  /** LSH banding: split the k-element signature into `bands` bands of
    * k/bands rows, hash each band. Docs sharing any (band index, band
    * hash) bucket become candidate pairs. Returns (doc_id, j, band). */
  def lshBands(sigs: DataFrame, k: Int = 8, bands: Int = 4): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    sigs.select(col("doc_id"), explode(transform(
      sequence(lit(0), lit(bands - 1)),
      j => struct(j.as("j"), md5(concat_ws("|",
        (1 to r).map(o => element_at(col("sig"), j * r + o)): _*)
        .cast("binary")).as("band")))).as("_b"))
      .select(col("doc_id"), col("_b.j").as("j"), col("_b.band").as("band"))
  }

  /** MinHash+LSH near-duplicate candidate pairs (doc_a &lt; doc_b),
    * deduplicated across bands. The self-join runs on (band index, band
    * hash) — bucket-local, never a cross product; AQE handles skewed
    * buckets. */
  def minhashCandidatePairs(docs: DataFrame, id: Column, text: Column,
                            k: Int = 8, bands: Int = 4): DataFrame = {
    val sigs = docs.select(id.cast("long").as("doc_id"),
      minhashSig(text, k).as("sig"))
    val b = lshBands(sigs, k, bands)
    val x = b.select(col("j"), col("band"), col("doc_id").as("doc_a"))
    val y = b.select(col("j"), col("band"), col("doc_id").as("doc_b"))
    x.join(y, Seq("j", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs: distinct
    * shingle-set intersection-over-union, computed only for LSH
    * candidates (the scale path: verification cost is proportional to
    * candidates, not n²). */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column,
                   threshold: Double, k: Int = 8, bands: Int = 4,
                   shingleN: Int = 3): DataFrame = {
    val cands = minhashCandidatePairs(docs, id, text, k, bands)
    val sets = docs.select(id.cast("long").as("doc_id"),
      array_distinct(wordShingles(text, shingleN)).as("sh"))
    cands
      .join(sets.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jac", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64 token hashes,
    * per-bit majority vote). Engine-specific hash → spec-gated, not
    * oracle-gated. Pure higher-order-function composition. */
  def withSimhash(df: DataFrame, textCol: String,
                  out: String = "simhash"): DataFrame =
    df.withColumn(out, expr(
      s"""aggregate(
         |  sequence(0, 63),
         |  0L,
         |  (acc, b) -> acc + shiftleft(
         |    CASE WHEN aggregate(
         |      transform(filter(split(lower(trim($textCol)), '\\\\s+'),
         |                       w -> w != ''),
         |                w -> xxhash64(w)),
         |      0L,
         |      (a2, h) -> a2 + CASE WHEN (shiftright(h, b) & 1) = 1
         |                      THEN 1L ELSE -1L END) > 0
         |    THEN 1L ELSE 0L END, b))""".stripMargin))

  /** SimHash near-dup candidates: bucket by each of the four 16-bit
    * bands (two near-dups differing in ≤3 bits must agree on ≥1 band),
    * verify by hamming distance. */
  def simhashNearDups(docs: DataFrame, id: Column, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val h = withSimhash(docs.select(id.cast("long").as("doc_id"),
      col(textCol)), textCol)
      .select(col("doc_id"), col("simhash"))
    val banded = h.select(col("doc_id"), col("simhash"),
      explode(array((0 to 3).map(i =>
        struct(lit(i).as("i"),
          shiftright(col("simhash"), 16 * i)
            .bitwiseAND(lit(0xFFFFL)).as("b"))): _*)).as("_x"))
      .select(col("doc_id"), col("simhash"),
        col("_x.i").as("i"), col("_x.b").as("b"))
    val x = banded.select(col("i"), col("b"), col("doc_id").as("doc_a"),
      col("simhash").as("h_a"))
    val y = banded.select(col("i"), col("b"), col("doc_id").as("doc_b"),
      col("simhash").as("h_b"))
    x.join(y, Seq("i", "b")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
