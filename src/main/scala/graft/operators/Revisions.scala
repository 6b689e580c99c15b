package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MVCC revision-tree resolution — the CouchDB/PouchDB winning-revision
  * rule over a table of revision-tree LEAVES.
  *
  * The reference data model (CouchDB `_rev`, reconstructed in SURVEY §1)
  * stores every document as a tree of revisions; replication can create
  * multiple leaves ("conflicts"). Every read resolves the tree with one
  * deterministic rule so that independent replicas pick the SAME winner
  * with no coordination:
  *
  *  1. non-deleted leaves beat deleted leaves;
  *  2. then the leaf with the highest revision position (tree depth) wins;
  *  3. position ties break to the lexicographically greatest revision hash.
  *
  * If every leaf is deleted the document is deleted, and the winner among
  * the deleted leaves (same pos/hash rule) is the deletion stub.
  *
  * Scale shape: the whole resolution is ONE partial-aggregable `groupBy` —
  * the winner is `max(struct(live, pos, hash))` (struct ordering compares
  * fields left-to-right, so the three rules fall out of one comparator),
  * merged map-side; no window, no per-doc sort shuffle. Per-document state
  * is bounded by the leaf count of one revision tree (small by contract:
  * leaves are CONFLICT branches, not history). Input rows must be unique
  * per (id, pos, hash) — a revision identifies a tree node exactly once.
  */
object Revisions {

  private def norm(df: DataFrame, id: Column, revPos: Column,
                   revHash: Column, deleted: Column): DataFrame =
    df.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"), deleted.cast("boolean").as("_del"))

  /** One row per document: the winning leaf `(id, rev_pos, rev_hash,
    * deleted)` under the rule above. */
  def winners(df: DataFrame, id: Column, revPos: Column,
              revHash: Column, deleted: Column): DataFrame =
    norm(df, id, revPos, revHash, deleted)
      .groupBy(col("_id"))
      .agg(max(struct((!col("_del")).as("live"), col("_pos").as("pos"),
        col("_hash").as("hash"))).as("w"))
      .select(col("_id").as("id"), col("w.pos").as("rev_pos"),
        col("w.hash").as("rev_hash"), (!col("w.live")).as("deleted"))

  /** Per-document resolution summary: the winner as a `pos-hash` rev
    * string, whether the doc resolves deleted, and the losing LIVE leaves
    * (= the conflict set a `conflicts=true` read reports), sorted, both as
    * a count and a comma-joined list. Same single-aggregation shape as
    * [[winners]]. */
  def summary(df: DataFrame, id: Column, revPos: Column,
              revHash: Column, deleted: Column): DataFrame = {
    val leaves = norm(df, id, revPos, revHash, deleted)
    val rev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    leaves
      .groupBy(col("_id"))
      .agg(
        max(struct((!col("_del")).as("live"), col("_pos").as("pos"),
          col("_hash").as("hash"))).as("w"),
        // collect_list drops the nulls the `when` leaves for deleted rows
        sort_array(collect_list(when(!col("_del"), rev))).as("liveRevs"))
      .select(col("_id"), col("w"), col("liveRevs"),
        concat(col("w.pos").cast("string"), lit("-"), col("w.hash"))
          .as("win_rev"))
      // a deleted winner implies liveRevs is empty, so removing the
      // winner unconditionally only ever removes a live winner
      .withColumn("confl", array_remove(col("liveRevs"), col("win_rev")))
      .select(col("_id").as("id"), col("win_rev"),
        (!col("w.live")).as("win_deleted"),
        size(col("confl")).cast("long").as("n_conflicts"),
        concat_ws(",", col("confl")).as("conflicts"))
  }

  /** The conflict relation itself: one row per losing live leaf,
    * `(id, rev_pos, rev_hash)` — what a replicator enumerates to repair
    * divergence. Exploded from [[summary]]'s bounded per-doc set. */
  def conflicts(df: DataFrame, id: Column, revPos: Column,
                revHash: Column, deleted: Column): DataFrame =
    summary(df, id, revPos, revHash, deleted)
      .filter(col("n_conflicts") > 0)
      .select(col("id"), explode(split(col("conflicts"), ",")).as("rev"))
      .select(col("id"),
        split_part(col("rev"), lit("-"), lit(1)).cast("long").as("rev_pos"),
        split_part(col("rev"), lit("-"), lit(2)).as("rev_hash"))

  /** REPLICA MERGE — the state a bidirectional replication converges
    * to: given the revision-tree leaves of two replicas, each leaf
    * carrying its ancestor path (`ancestors`: array of `"pos-hash"`
    * rev ids strictly above it — CouchDB's `_revisions` field), the
    * merged tree's leaves are the union MINUS any rev that is an
    * ANCESTOR of another leaf of the same doc: if replica B extended a
    * branch A still holds the tip of, A's tip stops being a leaf after
    * merge rather than surfacing as a fake conflict. Divergent
    * branches (neither ancestor of the other) BOTH survive — that is
    * a real conflict, resolved by the [[summary]] rule.
    *
    * Returns [[summary]] over the merged leaf set: one row per doc,
    * `(id, win_rev, win_deleted, n_conflicts, conflicts)` — identical
    * on both replicas, with no coordination; that convergence is the
    * CouchDB replication guarantee this operator reproduces.
    *
    * Scale shape: one groupBy to collapse revs both replicas share
    * (same rev id ⇒ same content, by the rev-hash contract), one
    * bounded explode of ancestor paths (tree depth, not corpus size),
    * one anti join on the 2-column rev id, then the single-aggregation
    * resolution. Everything keys on `id` or `(id, rev)` — no window,
    * no all-pairs. */
  def mergeReplicas(a: DataFrame, b: DataFrame, id: Column, revPos: Column,
                    revHash: Column, deleted: Column,
                    ancestors: Column): DataFrame = {
    def normA(df: DataFrame): DataFrame =
      df.select(id.as("_id"), revPos.cast("long").as("_pos"),
        revHash.cast("string").as("_hash"),
        deleted.cast("boolean").as("_del"), ancestors.as("_anc"))
    // union then collapse shared revs; max(struct) not first() so the
    // collapse stays deterministic even on malformed inputs
    val merged = normA(a).unionByName(normA(b))
      .groupBy(col("_id"), col("_pos"), col("_hash"))
      .agg(max(struct(col("_del"), col("_anc"))).as("_m"))
      .select(col("_id"), col("_pos"), col("_hash"),
        col("_m._del").as("_del"), col("_m._anc").as("_anc"))
    val anc = merged.select(col("_id"), explode(col("_anc")).as("_rev"))
      .distinct()
    val leaves = merged
      .withColumn("_rev",
        concat(col("_pos").cast("string"), lit("-"), col("_hash")))
      .join(anc, Seq("_id", "_rev"), "left_anti")
    summary(leaves, col("_id"), col("_pos"), col("_hash"), col("_del"))
  }
}
