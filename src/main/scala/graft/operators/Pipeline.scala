package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline compositions — the stages exist
  * individually ([[Text.qualityFilter]], [[Dedup.dedupCorpusBest]],
  * [[Dedup.decontaminate]], [[Relational.temperatureMix]],
  * [[Relational.epochShuffle]], [[Text.packSequences]]); this object
  * proves they COMPOSE: one call takes a raw document corpus to
  * packed, shuffled training sequences, and the whole chain replays
  * in the DuckDB oracle (gate q264). */
object Pipeline {

  /** The CORPUS RELEASE: the canonical pre-training data pipeline as
    * ONE relational expression —
    *
    *   quality filter → near-dup dedup (quality-best canonicals) →
    *   benchmark decontamination → temperature-weighted domain mix →
    *   deterministic epoch shuffle → fixed-length sequence packing.
    *
    * Every stage keeps the engine-portable determinism its standalone
    * operator has (md5-keyed sampling/shuffle, exact integer
    * thresholds, 1e-4 fixed-point ratios), so the END of the chain is
    * hash-gated against the oracle, not just each link.
    *
    * Returns one row per (document, sequence) overlap:
    * `(doc_id, pos, grp, seq, seq_start, seq_end, tok_start,
    * tok_end)` — `pos` is the document's epoch-shuffle position,
    * `grp` its round-robin packing shard `(pos−1) mod nShards`, and
    * the slice columns follow [[Text.packSequences]]'s contract
    * (documents concatenate in shuffle order within a shard).
    *
    * Scale shape: each stage is the standalone operator — no new
    * shuffles are introduced by the composition itself; the only
    * mid-pipeline action is ONE `count()` of the decontaminated
    * corpus to resolve the mix budget (`budgetOf`), the number a
    * release pipeline must know anyway to bill its token budget.
    *
    * `minTokens >= contaminationN` is required: a doc shorter than
    * one n-gram emits no row from [[Dedup.decontaminate]] and would
    * silently skip the contamination check; the quality stage's
    * length floor closes that hole by construction. */
  def corpusRelease(docs: DataFrame, id: Column, text: Column,
                    lang: Column, score: Column, domain: Column,
                    benchmark: DataFrame, bid: Column, btext: Column,
                    seed: String, seqLen: Int = 128, nShards: Int = 16,
                    minTokens: Long = 15, maxTokens: Long = 90,
                    minQuality: Double = 0.55,
                    allowedLangs: Seq[String] = Seq("en", "de", "zh"),
                    maxDupTokenFrac: Double = 0.6,
                    maxTopBigramFrac: Double = 0.1,
                    contaminationN: Int = 8,
                    maxContamination: Double = 0.05,
                    budgetOf: Long => Long = _ / 2): DataFrame = {
    require(minTokens >= contaminationN,
      s"corpusRelease: minTokens ($minTokens) must be >= the " +
        s"decontamination gram length ($contaminationN) — shorter " +
        "docs would skip the contamination check entirely")
    val base = docs.select(id.cast("long").as("doc_id"),
      text.cast("string").as("text"), lang.cast("string").as("lang"),
      score.cast("double").as("_score"),
      domain.cast("string").as("_dom"))
    // 1. document-level quality (Gopher/C4-style reason chain)
    val kept = Text.qualityFilter(base, col("doc_id"), col("text"),
        minTokens, maxTokens, minQuality, allowedLangs,
        maxDupTokenFrac, maxTopBigramFrac, lang = Some(col("lang")))
      .filter(col("keep")).select(col("doc_id"))
    val d1 = base.join(kept, Seq("doc_id"), "left_semi")
    // 2. exact + near-dup dedup, keeping each cluster's best-scored doc
    val mapping = Dedup.dedupCorpusBest(d1, col("doc_id"), col("text"),
      col("_score"))
    val d2 = d1.join(
      mapping.select(col("kept_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    // 3. benchmark decontamination (distinct n-gram containment)
    val cont = Dedup.decontaminate(d2, col("doc_id"), col("text"),
      benchmark, bid, btext, contaminationN)
    // pin the expensive quality→dedup→decontamination prefix: the
    // budget count below and the returned plan both consume d3, and
    // without the checkpoint the whole prefix would execute twice
    // (the syncBatch persist discipline; localCheckpoint because the
    // result is returned lazily, so there is no unpersist point)
    val d3 = d2.join(
      cont.filter(col("contamination") <= maxContamination)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
      .localCheckpoint()
    // 4. temperature-weighted domain mix to the release budget
    val budget = budgetOf(d3.count())
    val mixed = Relational.temperatureMix(d3, col("_dom"),
      col("doc_id"), budget)
    // 5. deterministic epoch shuffle — positions decide packing
    val shuffled = Relational.epochShuffle(
      mixed.select(col("doc_id"), col("text")), col("doc_id"), seed)
    // 6. pack in shuffle order across round-robin shards; the packing
    // id IS the shuffle position, joined back to the document id
    Text.packSequences(shuffled, col("pos"), col("text"), seqLen,
        group = pmod(col("pos") - 1, lit(nShards.toLong)))
      .withColumnRenamed("doc_id", "pos")
      .join(shuffled.select(col("doc_id"), col("pos")), Seq("pos"))
      .select(col("doc_id"), col("pos"), col("grp"), col("seq"),
        col("seq_start"), col("seq_end"), col("tok_start"),
        col("tok_end"))
  }
}
