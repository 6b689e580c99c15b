package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Revisions

class RevisionsSpec extends SparkSpecBase {

  private def leaves(rows: Seq[(String, Long, String, Boolean)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "rev_pos", "rev_hash", "deleted")
  }

  private def summarize(rows: Seq[(String, Long, String, Boolean)]) =
    Revisions.summary(leaves(rows), col("id"), col("rev_pos"),
      col("rev_hash"), col("deleted"))
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getString(4)))
      .toSeq

  test("docMeta: conflicts AND deleted_conflicts, winner excluded from its set") {
    def meta(rows: Seq[(String, Long, String, Boolean)]) =
      Revisions.docMeta(leaves(rows), col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"))
        .orderBy(col("id")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getString(4), r.getLong(5), r.getString(6)))
        .toSeq
    // live winner, one live conflict, one tombstoned branch
    val got = meta(Seq(
      ("a", 3L, "cc", false), ("a", 3L, "aa", false), ("a", 2L, "dd", true)))
    assert(got == Seq(("a", "3-cc", false, 1L, "3-aa", 1L, "2-dd")))
    // all-dead doc: the tombstone winner leaves the OTHER tombstone
    // as the deleted conflict, never itself
    val dead = meta(Seq(("b", 2L, "xx", true), ("b", 1L, "yy", true)))
    assert(dead == Seq(("b", "2-xx", true, 0L, "", 1L, "1-yy")))
    // single live leaf: both sets empty
    assert(meta(Seq(("c", 1L, "zz", false))) ==
      Seq(("c", "1-zz", false, 0L, "", 0L, "")))
  }

  test("a live leaf beats a DEEPER deleted leaf") {
    val got = summarize(Seq(
      ("a", 5L, "ffff", true), ("a", 2L, "aaaa", false)))
    assert(got == Seq(("a", "2-aaaa", false, 0L, "")))
  }

  test("among live leaves: deepest wins, depth ties break to greatest hash") {
    val got = summarize(Seq(
      ("b", 3L, "aa", false), ("b", 3L, "cc", false), ("b", 2L, "zz", false)))
    assert(got == Seq(("b", "3-cc", false, 2L, "2-zz,3-aa")))
  }

  test("all leaves deleted: doc resolves deleted, same (pos, hash) rule") {
    val got = summarize(Seq(
      ("c", 1L, "aa", true), ("c", 4L, "bb", true), ("c", 4L, "aa", true)))
    assert(got == Seq(("c", "4-bb", true, 0L, "")))
  }

  test("dbInfo: live docs vs deleted docs resolve under the winner rule") {
    // d1 live; d2 all branches deleted -> del count; d3 live branch
    // beats deleted branch -> live count
    val r = Revisions.dbInfo(leaves(Seq(
      ("d1", 1L, "aa", false),
      ("d2", 2L, "bb", true), ("d2", 1L, "cc", true),
      ("d3", 3L, "dd", true), ("d3", 1L, "ee", false))),
      col("id"), col("rev_pos"), col("rev_hash"), col("deleted")).head()
    assert((r.getLong(0), r.getLong(1)) == (2L, 1L))
  }

  test("winners/conflicts relations agree with the summary") {
    val rows = Seq(
      ("a", 5L, "ffff", true), ("a", 2L, "aaaa", false),
      ("b", 3L, "aa", false), ("b", 3L, "cc", false), ("b", 2L, "zz", false),
      ("c", 1L, "aa", true))
    val df = leaves(rows)
    val w = Revisions.winners(df, col("id"), col("rev_pos"),
      col("rev_hash"), col("deleted")).orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(w.toSeq == Seq(
      ("a", 2L, "aaaa", false), ("b", 3L, "cc", false), ("c", 1L, "aa", true)))
    val cf = Revisions.conflicts(df, col("id"), col("rev_pos"),
      col("rev_hash"), col("deleted")).orderBy("id", "rev_pos", "rev_hash")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(cf.toSeq == Seq(("b", 2L, "zz"), ("b", 3L, "aa")))
  }

  test("resolution is partitioning-invariant (partial-aggregable)") {
    import spark.implicits._
    val rows = (0 until 200).flatMap { i =>
      val id = s"d$i"
      Seq((id, 1L + i % 4, f"h$i%03d-m", i % 7 == 0)) ++
        (if (i % 3 == 0) Seq((id, 1L + (i / 3) % 4, f"h$i%03d-c", i % 6 == 0))
         else Nil)
    }
    val one = summarize(rows)
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts)
        .toDF("id", "rev_pos", "rev_hash", "deleted")
      val got = Revisions.summary(df, col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted")).orderBy(col("id")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getString(4))).toSeq
      assert(got == one, s"parts=$parts")
    }
  }

  private def replica(rows: Seq[(String, Long, String, Boolean, Seq[String])])
      : DataFrame = {
    import spark.implicits._
    rows.toDF("id", "rev_pos", "rev_hash", "deleted", "ancestors")
  }

  private def merge(a: Seq[(String, Long, String, Boolean, Seq[String])],
                    b: Seq[(String, Long, String, Boolean, Seq[String])]) =
    Revisions.mergeReplicas(replica(a), replica(b), col("id"),
      col("rev_pos"), col("rev_hash"), col("deleted"), col("ancestors"))
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getString(4))).toSeq

  test("mergeReplicas prunes a tip the other replica extended — no fake conflict") {
    // A holds 2-bb; B extended that same branch to 3-cc
    val a = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    val b = Seq(("d", 3L, "cc", false, Seq("2-bb", "1-aa")))
    assert(merge(a, b) == Seq(("d", "3-cc", false, 0L, "")))
    // and the merge converges: both replicas compute the same state
    assert(merge(b, a) == merge(a, b))
  }

  test("mergeReplicas surfaces genuine divergence as a conflict") {
    // both extended rev 1 independently — neither is the other's ancestor
    val a = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    val b = Seq(("d", 2L, "zz", false, Seq("1-aa")))
    // winner = greater hash at equal depth; loser is the conflict
    assert(merge(a, b) == Seq(("d", "2-zz", false, 1L, "2-bb")))
    assert(merge(b, a) == merge(a, b))
  }

  test("mergeReplicas: shared revs collapse; deleted branch loses; all-deleted resolves deleted") {
    val a = Seq(
      ("s", 1L, "aa", false, Seq.empty[String]),   // shared, unchanged
      ("x", 2L, "bb", false, Seq("1-aa")),
      ("t", 2L, "dd", true, Seq("1-cc")))
    val b = Seq(
      ("s", 1L, "aa", false, Seq.empty[String]),
      ("x", 2L, "ee", true, Seq("1-aa")),          // deleted divergent branch
      ("t", 2L, "dd", true, Seq("1-cc")))          // both deleted the doc
    assert(merge(a, b) == Seq(
      ("s", "1-aa", false, 0L, ""),
      ("t", "2-dd", true, 0L, ""),
      // live 2-bb beats the DELETED deeper-hash 2-ee; a deleted loser
      // is not a conflict
      ("x", "2-bb", false, 0L, "")))
  }

  private def purged(ls: Seq[(String, Long, String, Boolean, Seq[String])],
                     rq: Seq[(String, Long, String)]) = {
    import spark.implicits._
    Revisions.purge(replica(ls), col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"),
        rq.toDF("id", "rev_pos", "rev_hash"),
        col("id"), col("rev_pos"), col("rev_hash"))
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getString(4))).toSeq
  }

  test("purge resurrects the parent; a covered branch folds instead") {
    // d1: lone branch — purging the tip resurrects 2-bb (live)
    // d2: two branches over the same rev 1 — purging one tip folds it
    //     into the other branch; rev 1 stays interior
    val ls = Seq(
      ("d1", 3L, "cc", true, Seq("2-bb", "1-aa")),
      ("d2", 2L, "mm", false, Seq("1-kk")),
      ("d2", 2L, "zz", false, Seq("1-kk")))
    val got = purged(ls, Seq(("d1", 3L, "cc"), ("d2", 2L, "zz")))
    assert(got == Seq(
      ("d1", "2-bb", false, 0L, ""),
      ("d2", "2-mm", false, 0L, "")))
  }

  test("purge removes fully-purged docs entirely; delete keeps them") {
    val ls = Seq(
      ("gone", 1L, "aa", false, Seq.empty[String]),
      ("dead", 2L, "dd", true, Seq("1-cc")), // deleted, NOT purged
      ("live", 1L, "ee", false, Seq.empty[String]))
    val got = purged(ls, Seq(("gone", 1L, "aa")))
    // "gone" vanishes; "dead" still resolves (deleted); "live" intact
    assert(got == Seq(
      ("dead", "2-dd", true, 0L, ""),
      ("live", "1-ee", false, 0L, "")))
  }

  test("bulkGet: leaf hit, latest=true fan-out from an interior rev, explicit not_found") {
    import spark.implicits._
    val ls = Seq(
      // two branches over 1-aa: an interior request fans out to both
      ("d", 3L, "cc", false, Seq("2-bb", "1-aa")),
      ("d", 2L, "zz", true, Seq("1-aa")),
      ("e", 1L, "ee", false, Seq.empty[String]))
    val rq = Seq(
      ("d", 3L, "cc"),  // direct leaf hit
      ("d", 1L, "aa"),  // interior: two descending leaves
      ("d", 9L, "xx"),  // unknown rev
      ("f", 1L, "qq"))  // unknown doc
    val got = Revisions.bulkGet(replica(ls), col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"),
        rq.toDF("id", "rev_pos", "rev_hash"),
        col("id"), col("rev_pos"), col("rev_hash"))
      .orderBy(col("id"), col("req_rev"), col("rev")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).getOrElse("-"),
        if (r.isNullAt(4)) "-" else r.getBoolean(4).toString,
        Option(r.getString(5)).getOrElse("-"))).toSeq
    assert(got == Seq(
      ("d", "1-aa", "ok", "2-zz", "true", "2-zz,1-aa"),
      ("d", "1-aa", "ok", "3-cc", "false", "3-cc,2-bb,1-aa"),
      ("d", "3-cc", "ok", "3-cc", "false", "3-cc,2-bb,1-aa"),
      ("d", "9-xx", "not_found", "-", "-", "-"),
      ("f", "1-qq", "not_found", "-", "-", "-")), got.mkString("\n"))
  }

  test("truncateHistory keeps the newest ancestors; deep truncation makes the documented spurious conflict") {
    import spark.implicits._
    val a = Seq(("d", 3L, "cc", false, Seq("2-bb", "1-aa")))
    val b = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    def trunc(rows: Seq[(String, Long, String, Boolean, Seq[String])],
              limit: Int) =
      Revisions.truncateHistory(replica(rows), col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"), limit)
    // newest ancestors survive, oldest are forgotten
    assert(trunc(a, 2).select("ancestors").as[Seq[String]].head()
      == Seq("2-bb"))
    assert(trunc(a, 1).select("ancestors").as[Seq[String]].head()
      == Seq.empty[String])
    def merge(x: DataFrame, y: DataFrame) =
      Revisions.mergeReplicas(x, y, col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"))
        .select("id", "win_rev", "n_conflicts").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // enough history: B's tip folds into A's branch — no conflict
    assert(merge(trunc(a, 2), replica(b)) == Seq(("d", "3-cc", 0L)))
    // truncated past the link: the SAME merge shows CouchDB's
    // documented spurious conflict, resolved by the summary rule
    assert(merge(trunc(a, 1), replica(b)) == Seq(("d", "3-cc", 1L)))
    intercept[IllegalArgumentException](trunc(a, 0))
  }

  test("purge ignores requests that do not name a current leaf") {
    val ls = Seq(("d", 2L, "bb", false, Seq("1-aa")))
    // 1-aa is interior; 9-xx does not exist — both no-ops
    val got = purged(ls, Seq(("d", 1L, "aa"), ("d", 9L, "xx")))
    assert(got == Seq(("d", "2-bb", false, 0L, "")))
  }

  test("openRevs: all leaves travel with revisions paths, unknown ids are explicit not_found") {
    import spark.implicits._
    val ls = replica(Seq(
      ("d1", 2L, "bb", false, Seq("1-aa")),
      ("d1", 2L, "cc", true, Seq("1-aa")),    // tombstone branch tip
      ("d2", 1L, "kk", false, Seq.empty)))
    val ids = Seq("d1", "d2", "dX").toDF("rid")
    val out = Revisions.openRevs(ls, col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"),
        ids, col("rid"))
      .orderBy(col("id"), col("rev")).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull,
        Option(r.get(4)).map(_.toString).orNull))
    assert(out.toSeq == Seq(
      ("d1", "ok", "2-bb", "2-bb,1-aa"),
      ("d1", "ok", "2-cc", "2-cc,1-aa"),
      ("d2", "ok", "1-kk", "1-kk"),
      ("dX", "not_found", null, null)))
  }

  test("revsInfo: winner's chain only, statuses available/deleted/missing") {
    val ls = replica(Seq(
      ("d1", 3L, "cc", false, Seq("2-bb", "1-aa")),  // winner
      ("d1", 2L, "zz", true, Seq("1-aa")),           // losing tombstone
      ("d2", 2L, "dd", true, Seq("1-ee"))))          // deleted winner
    val out = Revisions.revsInfo(ls, col("id"), col("rev_pos"),
        col("rev_hash"), col("deleted"), col("ancestors"))
      .orderBy(col("id"), col("idx")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3)))
    assert(out.toSeq == Seq(
      // d1: the losing branch's 2-zz does NOT appear
      ("d1", 0, "3-cc", "available"),
      ("d1", 1, "2-bb", "missing"),
      ("d1", 2, "1-aa", "missing"),
      ("d2", 0, "2-dd", "deleted"),
      ("d2", 1, "1-ee", "missing")))
  }

  test("revsDiff: superseded revs are not misses, possible_ancestors are the leaves") {
    import spark.implicits._
    val target = replica(Seq(
      ("d1", 1L, "aa", false, Seq.empty),            // behind
      ("d2", 2L, "tt", false, Seq("1-kk")),          // diverged
      ("d3", 3L, "cc", false, Seq("2-bb", "1-aa")))) // ahead of pusher
    val req = Seq(
      ("d1", "2-bb"),  // extends d1 -> missing
      ("d2", "2-ss"),  // divergent -> missing
      ("d3", "2-bb"),  // already superseded -> NOT a miss
      ("d3", "3-cc"),  // already the leaf -> NOT a miss
      ("d9", "1-nn"))  // unknown doc -> missing, no ancestors
      .toDF("id", "rev")
    val got = Revisions.revsDiff(target, col("id"), col("rev_pos"),
        col("rev_hash"), col("ancestors"), req, col("id"), col("rev"))
      .orderBy(col("id"), col("rev")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("d1", "2-bb", "1-aa"),
      // the diverged SAME-depth leaf 2-tt is a sibling of the missing
      // 2-ss, not a possible ancestor (pos not strictly below)
      ("d2", "2-ss", ""),
      ("d9", "1-nn", "")))
  }

  test("missingRevs: per-doc sorted grouping, known/superseded revs excluded") {
    import spark.implicits._
    val target = replica(Seq(
      ("d1", 1L, "aa", false, Seq.empty),
      ("d3", 3L, "cc", false, Seq("2-bb", "1-aa"))))
    val req = Seq(
      ("d1", "2-zz"), ("d1", "2-bb"), ("d1", "2-bb"), // repeat collapses
      ("d3", "2-bb"),  // superseded -> known -> not a miss
      ("d3", "3-cc"),  // the leaf itself -> not a miss
      ("d9", "1-nn"), ("d9", "1-aa"))
      .toDF("id", "rev")
    val got = graft.operators.Revisions.missingRevs(target, col("id"),
        col("rev_pos"), col("rev_hash"), col("ancestors"),
        req, col("id"), col("rev"))
      .orderBy(col("id")).collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toSeq))
    // d3 has NO missing revs -> no row at all (the endpoint's shape)
    assert(got.toSeq == Seq(
      ("d1", Seq("2-bb", "2-zz")),
      ("d9", Seq("1-aa", "1-nn"))))
  }

  test("mergeReplicas and purge match a random rev-forest model") {
    case class Node(pos: Long, hash: String)
    type Chain = Seq[Node]
    def rev(n: Node) = s"${n.pos}-${n.hash}"
    for (seed <- 1 to 5) {
      val treeRnd = new scala.util.Random(seed * 1000 + 7)
      // per doc: 1-3 branches forking at the root, 0-3 levels below it
      val forest: Seq[(String, Seq[Chain])] = (0 until 25).map { d =>
        val root = Node(1, f"h${d}%02dr")
        val chains = (0 until 1 + treeRnd.nextInt(3)).map { b =>
          root +: (0 until treeRnd.nextInt(4)).map(i =>
            Node(2L + i, f"h${d}%02db${b}p${2 + i}"))
        }
        s"d$d" -> chains
      }
      def leafDel(id: String, n: Node) =
        math.abs((id + n.hash).hashCode) % 5 == 0
      // a replica knows a nonempty prefix of every chain
      def known(r: scala.util.Random): Map[String, Set[Node]] =
        forest.map { case (id, cs) =>
          id -> cs.flatMap(c => c.take(1 + r.nextInt(c.length))).toSet
        }.toMap
      def leavesOf(k: Map[String, Set[Node]]): Seq[(String, Node)] =
        forest.flatMap { case (id, cs) =>
          val ks = k.getOrElse(id, Set.empty)
          ks.filter { n =>
            !cs.exists(c => c.zip(c.drop(1)).exists {
              case (p, ch) => p == n && ks.contains(ch) })
          }.map(id -> _).toSeq
        }
      def pathOf(id: String, n: Node): Seq[String] = {
        val c = forest.toMap.apply(id).find(_.contains(n)).get
        c.take(c.indexOf(n)).reverse.map(rev)
      }
      def frame(ls: Seq[(String, Node)], delOf: (String, Node) => Boolean) = {
        import spark.implicits._
        ls.map { case (id, n) =>
          (id, n.pos, n.hash, delOf(id, n), pathOf(id, n)) }
          .toDF("id", "rev_pos", "rev_hash", "deleted", "ancestors")
      }
      def resolve(ls: Seq[(String, Node)], delOf: (String, Node) => Boolean) =
        ls.groupBy(_._1).toSeq.map { case (id, ns) =>
          // the winning-rev rule: live beats deleted, then deepest,
          // then lexicographically greatest hash
          val win = ns.map(_._2).sortWith { (a, b) =>
            val (da, db) = (delOf(id, a), delOf(id, b))
            if (da != db) !da
            else if (a.pos != b.pos) a.pos > b.pos
            else a.hash > b.hash
          }.head
          val confl = ns.map(_._2)
            .filter(n => !delOf(id, n) && n != win).map(rev).sorted
          (id, rev(win), delOf(id, win), confl.length.toLong,
            confl.mkString(","))
        }.sortBy(_._1)
      val kA = known(new scala.util.Random(seed))
      val kB = known(new scala.util.Random(seed + 99))
      val mergedKnown = forest.map { case (id, _) =>
        id -> (kA(id) ++ kB(id)) }.toMap
      val mergedLeaves = leavesOf(mergedKnown)
      // --- merge: operator vs model
      val got = Revisions.mergeReplicas(
        frame(leavesOf(kA), leafDel), frame(leavesOf(kB), leafDel),
        col("id"), col("rev_pos"), col("rev_hash"), col("deleted"),
        col("ancestors"))
        .orderBy(col("id")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getString(4))).toSeq
      assert(got == resolve(mergedLeaves, leafDel), s"merge seed=$seed")
      // --- purge: a random third of the merged leaves, model-checked
      val pr = new scala.util.Random(seed + 7)
      val victims = mergedLeaves.filter(_ => pr.nextInt(3) == 0)
      val afterKnown = mergedKnown.map { case (id, ks) =>
        id -> (ks -- victims.collect { case (i, n) if i == id => n }) }
      val afterLeaves = leavesOf(afterKnown)
      // post-purge: only revs that were MERGED LEAVES keep a del flag
      val mergedLeafSet = mergedLeaves.toSet
      def delAfter(id: String, n: Node) =
        mergedLeafSet.contains((id, n)) && leafDel(id, n)
      val gotPurged = {
        import spark.implicits._
        Revisions.purge(frame(mergedLeaves, leafDel), col("id"),
          col("rev_pos"), col("rev_hash"), col("deleted"), col("ancestors"),
          victims.map { case (id, n) => (id, n.pos, n.hash) }
            .toDF("id", "rev_pos", "rev_hash"),
          col("id"), col("rev_pos"), col("rev_hash"))
          .orderBy(col("id")).collect()
          .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
            r.getLong(3), r.getString(4))).toSeq
      }
      assert(gotPurged == resolve(afterLeaves, delAfter), s"purge seed=$seed")
    }
  }
}
