package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory swap for partition-grain rewrites (purge,
  * compaction) — the shared discipline behind
  * [[EventStore.purge]]/[[EventStore.compact]] and
  * [[ChangesFeed.purge]]/[[ChangesFeed.compact]].
  *
  * Protocol: write the rewritten partition to a `*_tmp_*` sibling,
  * then `rename(live -> _old_*)`, `rename(tmp -> live)`, delete old.
  * Between the two renames the partition's ONLY copy sits under the
  * `_old_*` name — a window a crash can land in. For a purge/compact
  * primitive that window must be RECOVERABLE, not just documented:
  * every maintenance entry point calls [[recover]] first, which
  * renames orphaned `_old_*` dirs back to their live name
  * (crash-between-renames), deletes superseded `_old_*` dirs whose
  * live dir exists (crash-after-publish), and clears `*_tmp_*`
  * debris. Net effect: a crashed swap converges to "old" and a
  * crashed cleanup to "new" on the next maintenance call — no row is
  * ever lost, matching the old-or-new contract the scaladocs claim.
  */
object SwapDir {

  // order matters: `_old_purge_` is itself `_old_`-prefixed
  private val OldPrefixes = Seq("_old_purge_", "_old_")
  private val TmpPrefixes = Seq("_purge_tmp_", "_compact_tmp_")

  /** True for directory/file names that are swap debris rather than
    * data — used by readers that walk stores recursively. */
  def isDebrisName(n: String): Boolean =
    OldPrefixes.exists(n.startsWith) || TmpPrefixes.exists(n.startsWith)

  /** Repair crashed swaps directly under `root`. Returns the live
    * names restored from an `_old_*` copy. Idempotent. */
  def recover(fs: FileSystem, root: Path): Seq[String] = {
    if (!fs.exists(root)) return Nil
    val recovered = scala.collection.mutable.ArrayBuffer[String]()
    fs.listStatus(root).filter(_.isDirectory).foreach { e =>
      val n = e.getPath.getName
      if (TmpPrefixes.exists(n.startsWith)) {
        fs.delete(e.getPath, true)
      } else OldPrefixes.find(n.startsWith).foreach { p =>
        val live = new Path(root, n.stripPrefix(p))
        if (fs.exists(live)) fs.delete(e.getPath, true)
        else {
          if (!fs.rename(e.getPath, live))
            throw new java.io.IOException(
              s"recover: cannot restore ${e.getPath} to $live")
          recovered += live.getName
        }
      }
    }
    recovered.toSeq
  }

  /** Publish `tmp` as `live`: live -> `oldName`, tmp -> live, delete
    * old. A crash between the renames leaves the partition only under
    * `oldName`; [[recover]] heals it on the next maintenance entry. */
  def publish(fs: FileSystem, live: Path, tmp: Path, oldName: String): Unit = {
    val old = new Path(live.getParent, oldName)
    fs.delete(old, true)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"swap: cannot move $live")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"swap: cannot publish $tmp")
    fs.delete(old, true)
  }
}
