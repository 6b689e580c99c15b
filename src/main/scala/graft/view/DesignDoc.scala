package graft.view

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A design document: a named group of views over one docs table that
  * materialize and update TOGETHER — the reference's unit of index
  * maintenance (all views in a CouchDB design doc share one indexer
  * pass over the change feed and advance one update_seq).
  *
  * Layout: each view's [[IndexStore]] index lives under
  * `root/<viewName>`; one [[update]] call folds a change batch into
  * every index, materializing the batch once (persist) so the change
  * feed is scanned once per batch, not once per view.
  */
final class DesignDoc(val views: Map[String, View]) {
  require(views.nonEmpty, "a design doc needs at least one view")

  private def pathOf(root: String, name: String) = s"$root/$name"

  /** Build every view's index, stamped with the same `seq`. */
  def materialize(root: String, numBuckets: Int = 0, seq: Long = 0L): Unit =
    views.foreach { case (n, v) =>
      v.materialize(pathOf(root, n), numBuckets, seq)
    }

  /** Apply one change batch to every view's index (the ddoc indexer
    * pass). The batch is pinned so each view's merge reads it from the
    * block manager instead of re-scanning the feed. */
  def update(spark: SparkSession, root: String, changedDocs: DataFrame,
             deletedIds: Seq[Any] = Nil, newSeq: Long = -1L): Unit = {
    val batch = changedDocs.persist()
    try views.foreach { case (n, v) =>
      v.updateIndex(spark, pathOf(root, n), batch, deletedIds, newSeq)
    } finally batch.unpersist()
  }

  /** Reopen every view from its materialized index. */
  def open(spark: SparkSession, root: String): Map[String, View] =
    views.map { case (n, v) => n -> v.fromIndex(spark, pathOf(root, n)) }

  /** The reference's `viewCleanup`/ddoc-delete: drop all indexes. */
  def cleanup(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** CouchDB's `GET /db/_design/{ddoc}/_info` — the view-index
    * status read an operator polls after deploys: one row per view
    * with the index's `update_seq` (the change-feed seq it is
    * current through), `purge_seq` (the store purge generation it
    * has caught up to), shard (`_kb` bucket) count, and on-disk
    * bytes (`sizes.file`). Meta scalars come from the `_graft_meta`
    * sidecar, bytes from one FS content summary per view — N stat
    * calls for N views, NO data read or scanned (the A41/H7 admin
    * discipline). A view whose index was never materialized reports
    * `exists = false` with -1 seqs, the "updater has not run" shape. */
  def info(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    views.keys.toSeq.sorted.map { n =>
      val p = pathOf(root, n)
      if (!IndexStore.exists(spark, p))
        (n, false, -1L, -1L, -1L, -1L)
      else {
        val m = IndexStore.readMeta(spark, p)
        val bytes = fs.getContentSummary(
          new org.apache.hadoop.fs.Path(p)).getLength
        (n, true, m.updateSeq, m.purgeSeq, m.buckets.toLong, bytes)
      }
    }.toDF("view_name", "exists", "update_seq", "purge_seq",
      "buckets", "size_file")
  }

  /** CouchDB's `POST /db/_view_cleanup` proper: remove index
    * directories under `root` that no view of the CURRENT design doc
    * references — the disk-reclaim admin verb run after a ddoc edit
    * drops or renames a view (the old signature's index files are
    * unreachable but still occupy space until cleanup). Driver-side
    * directory listing + deletes only — no data job; indexes of the
    * surviving views are never touched. Returns the removed view
    * names in name order (empty when nothing was orphaned). */
  def viewCleanup(spark: SparkSession, root: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val orphans = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(views.keySet).toSeq.sorted
    orphans.foreach { n =>
      val d = new Path(pathOf(root, n))
      if (!fs.delete(d, true))
        throw new java.io.IOException(
          s"_view_cleanup: could not remove orphaned index $d")
    }
    orphans
  }
}
