package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ChangesFeed

/** The CouchDB/PouchDB replication protocol, composed end to end as
  * set-at-a-time relational steps (the reference's replicator loop,
  * reconstructed in SURVEY §1: `_local` checkpoint read → `_changes`
  * since → `_revs_diff` → `_bulk_get` → `_bulk_docs new_edits=false` →
  * `_local` checkpoint write).
  *
  * Every step's cost is bounded by the DELTA, never the database:
  * the feed read prunes to seq buckets past the checkpoint, the
  * revs-diff is one anti join of the delta's leaf revs against the
  * target's known-rev relation, the fetch is [[Revisions.bulkGet]]'s
  * bounded path explode over just the misses, and the write leg
  * grafts just the fetched revisions onto the target's trees. A
  * steady-state sync of a 100 TB database that changed 1k docs costs
  * 1k docs.
  */
object Replication {

  /** One replication round's outputs: the target's NEW leaf relation
    * (lazy — persist it to make the write durable), and the feed
    * batch that produced it (`pushed`). Checkpoint AFTER the write is
    * durable: `ChangesFeed.checkpointAfter(spark, feedPath, repId,
    * round.pushed)` — advancing first would lose the batch on a
    * crash between checkpoint and write (the CouchDB replicator's
    * write-then-checkpoint discipline). */
  final case class ReplicationRound(targetLeaves: DataFrame,
                                    pushed: DataFrame)

  /** `_bulk_docs` with `new_edits=false` — the replicator's WRITE
    * leg: graft a batch of fetched revisions onto the target's
    * revision trees WITHOUT minting new revs. Each incoming row
    * carries the rev it IS (`inPos`/`inHash`), its deleted flag, and
    * its `_revisions` ancestor path (deepest-first `"pos-hash"` ids,
    * the [[Revisions.bulkGet]] shape) — the path is what lets the
    * target recognize that an incoming rev EXTENDS a branch it holds
    * the old tip of (the old tip stops being a leaf) versus opens a
    * genuinely divergent branch (a real conflict, kept). Returns the
    * target's new leaf relation `(id, rev_pos, rev_hash, deleted,
    * ancestors)`.
    *
    * Same tree-merge core as [[Revisions.mergeReplicas]]
    * ([[Revisions.mergeLeaves]]): one groupBy collapsing revs both
    * sides share, one bounded ancestor-path explode (tree depth, not
    * corpus size), one anti join — no window, no all-pairs. Writing a
    * million-doc batch onto a trillion-doc target keys every join on
    * `(id, rev)`. */
  def applyBulkDocs(target: DataFrame, id: Column, revPos: Column,
                    revHash: Column, deleted: Column, ancestors: Column,
                    incoming: DataFrame, inId: Column, inPos: Column,
                    inHash: Column, inDel: Column,
                    inAnc: Column): DataFrame = {
    def norm(df: DataFrame, i: Column, p: Column, h: Column, d: Column,
             a: Column): DataFrame =
      df.select(i.as("_id"), p.cast("long").as("_pos"),
        h.cast("string").as("_hash"), d.cast("boolean").as("_del"),
        a.as("_anc"))
    Revisions.mergeLeaves(
        norm(target, id, revPos, revHash, deleted, ancestors),
        norm(incoming, inId, inPos, inHash, inDel, inAnc))
      .select(col("_id").as("id"), col("_pos").as("rev_pos"),
        col("_hash").as("rev_hash"), col("_del").as("deleted"),
        col("_anc").as("ancestors"))
  }

  /** One full PULL replication round — PouchDB's
    * `replicate(source, target)` for the batch since `repId`'s last
    * checkpoint. `source` and `target` are revision-tree LEAF
    * relations in the shared contract (`id`…`ancestors` name the
    * columns in BOTH); `feedPath` is the source's [[ChangesFeed]]
    * store.
    *
    * The steps, each delta-bounded:
    *  1. resume point: the `_local` checkpoint for `repId`;
    *  2. `_changes style=all_docs` since it — every changed doc's
    *     full leaf set (tombstone tips included: they must travel);
    *  3. `_revs_diff`: anti-join the delta's leaf revs against
    *     everything the target KNOWS — its leaves AND their ancestor
    *     paths (a rev the target has already superseded is not a
    *     miss, so a round-tripped edit is never re-fetched);
    *  4. `_bulk_get` the misses with their `_revisions` paths;
    *  5. [[applyBulkDocs]] them onto the target's trees.
    *
    * Returns the round lazily; persist `targetLeaves`, then advance
    * the checkpoint with `ChangesFeed.checkpointAfter(spark,
    * feedPath, repId, round.pushed)`. Re-running a round before the
    * checkpoint advances is harmless: every step is idempotent (revs
    * the target has stop being misses). After checkpointing, the next
    * round's delta is empty — convergence. */
  def replicateOnce(spark: SparkSession, feedPath: String, repId: String,
                    source: DataFrame, target: DataFrame, id: Column,
                    revPos: Column, revHash: Column, deleted: Column,
                    ancestors: Column): ReplicationRound = {
    val sinceSeq = ChangesFeed.readCheckpoint(spark, feedPath, repId)
    val feed = ChangesFeed.sinceStyleAllDocs(spark, feedPath, sinceSeq,
      source, id, revPos, revHash, deleted)
    val candidates = feed
      .select(col("id"), explode(col("changes")).as("rev")).distinct()
    val tgt = target.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"), ancestors.as("_anc"))
    val tgtRev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    val known = tgt.select(col("_id").as("id"), tgtRev.as("rev"))
      .unionByName(tgt.select(col("_id").as("id"),
        explode(col("_anc")).as("rev")))
      .distinct()
    val misses = candidates.join(known, Seq("id", "rev"), "left_anti")
      .select(col("id"),
        split_part(col("rev"), lit("-"), lit(1)).cast("long").as("rev_pos"),
        split_part(col("rev"), lit("-"), lit(2)).as("rev_hash"))
    val revsArr = split(col("revisions"), ",")
    val incoming = Revisions.bulkGet(source, id, revPos, revHash, deleted,
        ancestors, misses, col("id"), col("rev_pos"), col("rev_hash"))
      .filter(col("status") === "ok")
      .select(col("id"),
        split_part(col("rev"), lit("-"), lit(1)).cast("long").as("rev_pos"),
        split_part(col("rev"), lit("-"), lit(2)).as("rev_hash"),
        col("deleted"),
        // `revisions` is self-first; the ancestors are the rest
        slice(revsArr, lit(2), greatest(size(revsArr) - 1, lit(0)))
          .as("ancestors"))
    val merged = applyBulkDocs(target, id, revPos, revHash, deleted,
      ancestors, incoming, col("id"), col("rev_pos"), col("rev_hash"),
      col("deleted"), col("ancestors"))
    ReplicationRound(merged, feed)
  }
}
