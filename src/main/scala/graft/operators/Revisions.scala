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

  /** `GET /db/{docid}?meta=true` — the full per-document revision
    * metadata read in ONE aggregation: the winner, its deleted flag,
    * the `_conflicts` array (losing LIVE leaves — [[summary]]'s set)
    * AND the `_deleted_conflicts` array (losing TOMBSTONED leaves:
    * branches that were conflicts until someone deleted them — the
    * set a conflict-repair tool checks to know a divergence was
    * already resolved, and the one piece of `meta=true` [[summary]]
    * does not carry). Both sets sorted, reported as count +
    * comma-joined list. Same single partial-aggregable `max(struct)`
    * groupBy shape as [[summary]] — the extra array is one more
    * conditional collect in the SAME pass, not a second scan. A
    * deleted winner removes itself from the deleted set exactly as a
    * live winner does from the conflict set. */
  def docMeta(df: DataFrame, id: Column, revPos: Column,
              revHash: Column, deleted: Column): DataFrame = {
    val leaves = norm(df, id, revPos, revHash, deleted)
    val rev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    leaves
      .groupBy(col("_id"))
      .agg(
        max(struct((!col("_del")).as("live"), col("_pos").as("pos"),
          col("_hash").as("hash"))).as("w"),
        sort_array(collect_list(when(!col("_del"), rev))).as("liveRevs"),
        sort_array(collect_list(when(col("_del"), rev))).as("delRevs"))
      .withColumn("win_rev",
        concat(col("w.pos").cast("string"), lit("-"), col("w.hash")))
      .withColumn("confl", array_remove(col("liveRevs"), col("win_rev")))
      .withColumn("dconfl", array_remove(col("delRevs"), col("win_rev")))
      .select(col("_id").as("id"), col("win_rev"),
        (!col("w.live")).as("win_deleted"),
        size(col("confl")).cast("long").as("n_conflicts"),
        concat_ws(",", col("confl")).as("conflicts"),
        size(col("dconfl")).cast("long").as("n_deleted_conflicts"),
        concat_ws(",", col("dconfl")).as("deleted_conflicts"))
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

  /** CouchDB's `GET /db` info counts from a leaf relation: `doc_count`
    * (documents RESOLVING live under the winner rule — a doc whose
    * every branch is deleted does not count) and `doc_del_count`
    * (documents resolving deleted). One further partial-aggregable
    * pass over [[summary]]'s per-doc rows — at any corpus size this is
    * the same single-shuffle shape as the resolution itself. */
  def dbInfo(df: DataFrame, id: Column, revPos: Column,
             revHash: Column, deleted: Column): DataFrame =
    summary(df, id, revPos, revHash, deleted)
      .agg(count(when(!col("win_deleted"), lit(1))).as("doc_count"),
        count(when(col("win_deleted"), lit(1))).as("doc_del_count"))

  /** PURGE — CouchDB's `_purge`: remove specific LEAF revisions with no
    * tombstone left behind (deletion is an edit that replicates; purge
    * is surgery that un-happens a write — the GDPR/bad-crawl eraser).
    * Purging a branch tip RESURRECTS its deepest surviving ancestor as
    * the branch's new leaf — unless that ancestor is also on the path
    * of another surviving leaf, in which case the branch folds into
    * the tree and nothing resurrects.
    *
    * Input model is [[mergeReplicas]]'s: leaves with `ancestors` =
    * `"pos-hash"` path, deepest first. Requests name `(id, rev_pos,
    * rev_hash)`; requests that do not match a CURRENT leaf are ignored
    * (CouchDB validates the same way — interior revs are not
    * purgeable). Interior revisions carry no stored deleted flag in
    * this model; a resurrected ancestor is served live (CouchDB
    * deletion stubs are branch TIPS by construction, so an interior
    * rev being live is the overwhelmingly common truth; a resurrected
    * stub would need the full rev-tree store this model deliberately
    * elides).
    *
    * Returns [[summary]] over the post-purge leaf set — docs whose
    * every branch is purged DISAPPEAR from the output (that is the
    * purge/delete difference).
    *
    * Scale shape: one bounded path explode (tree depth), two
    * hash-joins on (id, rev) — leaf validation and coverage — and the
    * single-aggregation resolution; no window, no all-pairs. */
  def purge(leaves: DataFrame, id: Column, revPos: Column,
            revHash: Column, deleted: Column, ancestors: Column,
            requests: DataFrame, reqId: Column, reqPos: Column,
            reqHash: Column): DataFrame =
    summary(purgeLeaves(leaves, id, revPos, revHash, deleted, ancestors,
        requests, reqId, reqPos, reqHash),
      col("id"), col("rev_pos"), col("rev_hash"), col("deleted"))

  /** The post-purge LEAF relation `(id, rev_pos, rev_hash, deleted,
    * ancestors)` behind [[purge]] — what a persisted store rewrites
    * ([[Replication.purgeTarget]]): resurrected ancestors carry their
    * correctly SLICED paths, fully-purged docs produce no row. */
  def purgeLeaves(leaves: DataFrame, id: Column, revPos: Column,
                  revHash: Column, deleted: Column, ancestors: Column,
                  requests: DataFrame, reqId: Column, reqPos: Column,
                  reqHash: Column): DataFrame = {
    val in = leaves.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"),
      deleted.cast("boolean").as("_del"), ancestors.as("_anc"))
    val req = requests.select(reqId.as("_id"),
        reqPos.cast("long").as("_pos"), reqHash.cast("string").as("_hash"))
      // only CURRENT leaves are purgeable
      .join(in.select(col("_id"), col("_pos"), col("_hash")),
        Seq("_id", "_pos", "_hash"), "left_semi")
    // the tree's NODES: every leaf plus every rev on a leaf's path
    // (interior revs live, path = the suffix above them); a rev seen
    // both ways keeps its leaf truth (max: true > false on _isleaf)
    val fromLeaves = in.select(col("_id"), col("_pos"), col("_hash"),
      col("_del"), col("_anc").as("_path"), lit(true).as("_isleaf"))
    val fromPaths = in.select(col("_id"),
        posexplode(col("_anc")).as(Seq("_i", "_rev")), col("_anc"))
      .select(col("_id"),
        split_part(col("_rev"), lit("-"), lit(1)).cast("long").as("_pos"),
        split_part(col("_rev"), lit("-"), lit(2)).as("_hash"),
        lit(false).as("_del"),
        slice(col("_anc"), col("_i") + 2,
          greatest(size(col("_anc")) - col("_i") - 1, lit(0))).as("_path"),
        lit(false).as("_isleaf"))
    val nodes = fromLeaves.unionByName(fromPaths)
      .groupBy(col("_id"), col("_pos"), col("_hash"))
      .agg(max(struct(col("_isleaf"), col("_del"))).as("_m"),
        max(col("_path")).as("_path"))
      .select(col("_id"), col("_pos"), col("_hash"),
        (col("_m._isleaf") && col("_m._del")).as("_del"), col("_path"))
    val surviving = nodes.join(req, Seq("_id", "_pos", "_hash"), "left_anti")
    // a surviving rev on ANOTHER surviving rev's path is interior
    val covered = surviving
      .select(col("_id"), explode(col("_path")).as("_rev")).distinct()
    val newLeaves = surviving
      .withColumn("_rev",
        concat(col("_pos").cast("string"), lit("-"), col("_hash")))
      .join(covered, Seq("_id", "_rev"), "left_anti")
    newLeaves.select(col("_id").as("id"), col("_pos").as("rev_pos"),
      col("_hash").as("rev_hash"), col("_del").as("deleted"),
      col("_path").as("ancestors"))
  }

  /** `_bulk_get` — the replicator's FETCH leg (CouchDB's batch endpoint
    * between `_revs_diff` and the target write): given the `(id, rev)`
    * pairs a target reported missing, return each requested revision
    * with what the target needs to INSERT it — the served leaf's rev,
    * its deleted flag, and its full `_revisions` path (self first, then
    * ancestors, CouchDB's field). Requests use `latest=true` semantics,
    * the replicator's mode: a request naming an INTERIOR revision is
    * answered by every CURRENT leaf descending from it (one row per
    * leaf — a branch point fans out, exactly as CouchDB returns
    * multiple docs), because interior bodies may be compacted away.
    * Requests naming no known revision come back as explicit
    * `not_found` rows in the same relation — per-item errors, never
    * omission.
    *
    * Input model is [[mergeReplicas]]'s leaf relation. Scale shape: one
    * bounded path explode (tree depth × leaves, never corpus²) and one
    * hash join from requests onto the (id, rev) node relation; no
    * window, no driver loop — a replicator fetching a million missing
    * revs is one join. */
  def bulkGet(leaves: DataFrame, id: Column, revPos: Column,
              revHash: Column, deleted: Column, ancestors: Column,
              requests: DataFrame, reqId: Column, reqPos: Column,
              reqHash: Column): DataFrame = {
    val in = leaves.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"),
      deleted.cast("boolean").as("_del"), ancestors.as("_anc"))
    val req = requests.select(reqId.as("_rq_id"),
        concat(reqPos.cast("long").cast("string"), lit("-"),
          reqHash.cast("string")).as("req_rev"))
      .distinct()
    // every (leaf, node-on-its-path) pair, the leaf itself included —
    // the relation a latest=true request probes
    val nodes = in
      .withColumn("_rev",
        concat(col("_pos").cast("string"), lit("-"), col("_hash")))
      .withColumn("_revisions",
        concat(array(col("_rev")), col("_anc")))
      .select(col("_id"), col("_rev"), col("_del"), col("_revisions"),
        explode(col("_revisions")).as("_member"))
    req.join(nodes,
        col("_rq_id") === col("_id") && col("req_rev") === col("_member"),
        "left")
      .select(col("_rq_id").as("id"), col("req_rev"),
        when(col("_rev").isNull, lit("not_found")).otherwise(lit("ok"))
          .as("status"),
        col("_rev").as("rev"),
        col("_del").as("deleted"),
        // NULL (not "") for a miss: concat_ws would mint an empty
        // string out of the unmatched row's null array
        when(col("_rev").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(",", col("_revisions"))).as("revisions"))
  }

  /** The `_revs_diff` ENDPOINT (the target side of the replication
    * handshake, as a public API — [[graft.operators.Replication
    * .replicateOnce]] runs the same anti join internally): given this
    * database's leaf relation and the `(id, rev)` pairs a pusher
    * holds, report each rev the database MISSES — not a leaf and not
    * on any leaf's ancestor path (a rev already superseded is NOT a
    * miss, so round-tripped edits are never re-pushed) — together
    * with the doc's `possible_ancestors`: the database's own leaf
    * revs for that id whose pos is STRICTLY below the missing rev's
    * pos (couch_db:possible_ancestors/2 — a diverged same-depth leaf
    * is a sibling, not an ancestor), CouchDB's hint that lets the
    * pusher send attachment stubs (`atts_since`) and truncated
    * `_revisions` paths. Requests the database already knows produce
    * no row (the endpoint's shape); an unknown doc's misses carry
    * empty ancestors.
    *
    * Shape: one bounded ancestor-path explode (tree depth), one anti
    * join on (id, rev), one pos-bounded join onto the leaf relation —
    * a million-rev diff is two joins. */
  def revsDiff(leaves: DataFrame, id: Column, revPos: Column,
               revHash: Column, ancestors: Column, requests: DataFrame,
               reqId: Column, reqRev: Column): DataFrame = {
    val in = leaves.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"), ancestors.as("_anc"))
    val rev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    val known = in.select(col("_id").as("id"), rev.as("rev"))
      .unionByName(in.select(col("_id").as("id"),
        explode(col("_anc")).as("rev")))
      .distinct()
    val req = requests
      .select(reqId.as("id"), reqRev.cast("string").as("rev")).distinct()
    // CouchDB's couch_db:possible_ancestors/2: a stored leaf is a
    // possible ancestor of a missing rev only when its pos is
    // STRICTLY below the missing rev's pos — a diverged same-depth
    // leaf (missing 2-s vs leaf 2-t) is a sibling, not an ancestor.
    val leaves2 = in.select(col("_id"), col("_pos"), rev.as("_leaf"))
    req.join(known, Seq("id", "rev"), "left_anti")
      .withColumn("_rpos", split(col("rev"), "-", 2).getItem(0)
        .cast("long"))
      .join(leaves2,
        col("id") === col("_id") && col("_pos") < col("_rpos"), "left")
      .groupBy(col("id"), col("rev"))
      .agg(concat_ws(",",
        sort_array(collect_list(col("_leaf")))).as("possible_ancestors"))
  }

  /** The `_missing_revs` ENDPOINT (CouchDB's `POST /db/_missing_revs`
    * — the lighter sibling of [[revsDiff]], the pre-`_revs_diff`
    * replicator handshake that is still a public endpoint): given
    * this database's leaf relation and the `(id, rev)` pairs a pusher
    * holds, report PER DOC the requested revs the database does not
    * know (not a leaf and not on any leaf's ancestor path — the same
    * known set as [[revsDiff]]), sorted, one row per doc with at
    * least one miss. Docs whose every requested rev is known produce
    * no row (the endpoint's shape). Same bounded-explode + anti-join
    * scale shape as [[revsDiff]] minus the ancestor join. */
  def missingRevs(leaves: DataFrame, id: Column, revPos: Column,
                  revHash: Column, ancestors: Column, requests: DataFrame,
                  reqId: Column, reqRev: Column): DataFrame = {
    val in = leaves.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"), ancestors.as("_anc"))
    val rev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    val known = in.select(col("_id").as("id"), rev.as("rev"))
      .unionByName(in.select(col("_id").as("id"),
        explode(col("_anc")).as("rev")))
      .distinct()
    requests.select(reqId.as("id"), reqRev.cast("string").as("rev"))
      .distinct()
      .join(known, Seq("id", "rev"), "left_anti")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("rev"))).as("missing_revs"))
  }

  /** `GET doc?open_revs=all` — every CURRENT leaf revision of each
    * requested document with its `_revisions` path (self-first), the
    * read the reference's replicator issues to fetch a doc's full
    * branch set in one call (conflict branches and tombstone tips
    * included — that is the point of `open_revs` vs a winner read).
    * A requested id with NO leaves comes back as an explicit
    * `not_found` row in the same relation (the endpoint's
    * `{"missing"}` entry) — per-item errors, never omission.
    *
    * Scale shape: one hash join from the (distinct) request ids onto
    * the leaf relation — a million-doc fetch is one join, no
    * per-doc calls. */
  def openRevs(leaves: DataFrame, id: Column, revPos: Column,
               revHash: Column, deleted: Column, ancestors: Column,
               ids: DataFrame, reqId: Column): DataFrame = {
    val in = leaves.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"),
      deleted.cast("boolean").as("_del"), ancestors.as("_anc"))
    val req = ids.select(reqId.as("id")).distinct()
    val rev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    req.join(in, col("id") === col("_id"), "left")
      .select(col("id"),
        when(col("_pos").isNull, lit("not_found")).otherwise(lit("ok"))
          .as("status"),
        when(col("_pos").isNull, lit(null).cast("string"))
          .otherwise(rev).as("rev"),
        col("_del").as("deleted"),
        when(col("_pos").isNull, lit(null).cast("string"))
          .otherwise(concat_ws(",", concat(array(rev), col("_anc"))))
          .as("revisions"))
  }

  /** `GET doc?revs_info=true` — the WINNING revision's full known
    * history, newest first, each entry carrying CouchDB's status
    * vocabulary: `available` (a live leaf — its body is stored),
    * `deleted` (a tombstone leaf — the stub is stored), `missing`
    * (an interior ancestor whose body this model does not retain,
    * exactly CouchDB's answer for compacted history). `idx` is the
    * 0-based position in the chain (0 = the winner itself).
    *
    * Losing conflict branches do NOT appear — `revs_info` reports the
    * winner's chain only (enumerate branches with [[openRevs]] /
    * `conflicts=true`). Shape: the one-aggregation winner resolution
    * (ancestor path carried through the same `max(struct)`), a
    * bounded path explode (tree depth), and one hash join back onto
    * the leaf set for statuses. */
  def revsInfo(leaves: DataFrame, id: Column, revPos: Column,
               revHash: Column, deleted: Column,
               ancestors: Column): DataFrame = {
    val in = leaves.select(id.as("_id"), revPos.cast("long").as("_pos"),
      revHash.cast("string").as("_hash"),
      deleted.cast("boolean").as("_del"), ancestors.as("_anc"))
    val rev = concat(col("_pos").cast("string"), lit("-"), col("_hash"))
    // live > deepest > greatest hash, the ancestors riding along
    // (the comparison never reaches them: (live,pos,hash) is unique)
    val win = in.groupBy(col("_id"))
      .agg(max(struct((!col("_del")).as("live"), col("_pos").as("pos"),
        col("_hash").as("hash"), col("_anc").as("anc"))).as("w"))
      .select(col("_id"),
        concat(array(concat(col("w.pos").cast("string"), lit("-"),
          col("w.hash"))), col("w.anc")).as("_chain"))
    val chain = win.select(col("_id"),
      posexplode(col("_chain")).as(Seq("idx", "rev")))
    val leafStatus = in.select(col("_id"), rev.as("rev"),
      when(col("_del"), lit("deleted")).otherwise(lit("available"))
        .as("_st"))
    chain.join(leafStatus, Seq("_id", "rev"), "left")
      .select(col("_id").as("id"), col("idx"), col("rev"),
        coalesce(col("_st"), lit("missing")).as("status"))
  }

  /** CouchDB's `_revs_limit`: cap how much revision HISTORY a stored
    * leaf carries — each leaf keeps its newest `limit - 1` ancestors
    * (self + ancestors = at most `limit` revs), older path entries are
    * forgotten. Returns the leaf relation with the `ancestors` column
    * truncated; everything else passes through.
    *
    * The documented CouchDB trade-off carries over verbatim (and is
    * spec-pinned): two replicas that truncated DIFFERENTLY can lose
    * the shared ancestor that proves one branch extends the other, so
    * [[mergeReplicas]] may surface a spurious conflict after deep
    * truncation — the price of bounded per-doc metadata, resolved
    * deterministically by the [[summary]] rule like any conflict.
    * Map-only (`slice`), no shuffle. */
  def truncateHistory(leaves: DataFrame, id: Column, revPos: Column,
                      revHash: Column, deleted: Column,
                      ancestors: Column, limit: Int): DataFrame = {
    require(limit >= 1, s"_revs_limit must be >= 1, got $limit")
    leaves.select(id.as("id"), revPos.cast("long").as("rev_pos"),
      revHash.cast("string").as("rev_hash"),
      deleted.cast("boolean").as("deleted"),
      slice(ancestors, 1, limit - 1).as("ancestors"))
  }

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
    val leaves = mergeLeaves(normA(a), normA(b))
    summary(leaves, col("_id"), col("_pos"), col("_hash"), col("_del"))
  }

  /** The tree-merge core of [[mergeReplicas]] (and of `_bulk_docs`
    * `new_edits=false` — [[Replication.applyBulkDocs]]): union two
    * NORMALIZED leaf relations (`_id, _pos, _hash, _del, _anc`),
    * collapse revs both sides share, and drop any rev that is an
    * ANCESTOR of another leaf of the same doc — an extended branch's
    * old tip stops being a leaf instead of surfacing as a fake
    * conflict; true divergence survives as real branches. Returns the
    * merged LEAF relation in the same normalized shape. */
  private[operators] def mergeLeaves(a: DataFrame,
                                     b: DataFrame): DataFrame = {
    // union then collapse shared revs; max(struct) not first() so the
    // collapse stays deterministic even on malformed inputs
    val merged = a.unionByName(b)
      .groupBy(col("_id"), col("_pos"), col("_hash"))
      .agg(max(struct(col("_del"), col("_anc"))).as("_m"))
      .select(col("_id"), col("_pos"), col("_hash"),
        col("_m._del").as("_del"), col("_m._anc").as("_anc"))
    val anc = merged.select(col("_id"), explode(col("_anc")).as("_rev"))
      .distinct()
    merged
      .withColumn("_rev",
        concat(col("_pos").cast("string"), lit("-"), col("_hash")))
      .join(anc, Seq("_id", "_rev"), "left_anti")
      .drop("_rev")
  }
}
