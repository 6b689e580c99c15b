package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.collation.CollationCodec
import graft.gfunctions._
import graft.view.{MaxKey, QueryOpts, Reduce, View}

class ViewSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("collation_key expression (codegen path) matches driver-side encoding") {
    val df = Seq(("a", 1.0), ("b", -2.5), ("", 0.0)).toDF("s", "d")
    val got = df.select(collation_key($"s"), collation_key($"d"),
      collation_key(array($"d", $"d" * 2)), collation_key(lit(null))).collect()
    val exp = Seq(("a", 1.0), ("b", -2.5), ("", 0.0)).map { case (s, d) =>
      (CollationCodec.encodeScala(s), CollationCodec.encodeScala(d),
       CollationCodec.encodeScala(Seq(d, d * 2)), CollationCodec.encodeScala(null))
    }
    got.zip(exp).foreach { case (row, (a, b, c, n)) =>
      assert(row.getAs[Array[Byte]](0).sameElements(a))
      assert(row.getAs[Array[Byte]](1).sameElements(b))
      assert(row.getAs[Array[Byte]](2).sameElements(c))
      assert(row.getAs[Array[Byte]](3).sameElements(n))
    }
  }

  test("DataFrame sort by collation_key equals CouchDB order across types") {
    // Mixed-type keys via a unioned view: numbers < strings.
    val nums = Seq(3.0, 1.0, 2.0).toDF("v").select(collation_key($"v").as("ck"), $"v".cast("string").as("orig"))
    val strs = Seq("b", "a").toDF("v").select(collation_key($"v").as("ck"), $"v".as("orig"))
    val sorted = nums.union(strs).orderBy($"ck").select($"orig").as[String].collect()
    assert(sorted.toSeq == Seq("1.0", "2.0", "3.0", "a", "b"))
  }

  test("emit + _sum + group") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)"), Some(Reduce.Sum))
    val got = v.query(QueryOpts(group = true)).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val exp = orders.groupBy($"o_orderstatus")
      .agg(sum($"o_totalprice".cast("decimal(18,2)"))).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(got == exp)
    // group keys come back in collation (string) order
    val keys = v.query(QueryOpts(group = true)).collect().map(_.getString(0)).toSeq
    assert(keys == keys.sorted)
  }

  test("_count without group reduces to a single row with null key") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1), Some(Reduce.Count))
    val rows = v.query().collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(0))
    assert(rows(0).getLong(1) == orders.count())
  }

  test("_stats matches manual aggregation") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", $"o_totalprice", Some(Reduce.Stats))
    val r = v.query(QueryOpts(group = true)).collect()
      .map(x => x.getString(0) -> x.getStruct(1)).toMap
    val exp = orders.groupBy($"o_orderstatus").agg(
      sum($"o_totalprice"), count($"o_totalprice"), min($"o_totalprice"),
      max($"o_totalprice"), sum($"o_totalprice" * $"o_totalprice")).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))).toMap
    r.foreach { case (k, s) =>
      val (sm, c, mn, mx, sq) = exp(k)
      assert(s.getDouble(0) == sm && s.getLong(1) == c &&
        s.getDouble(2) == mn && s.getDouble(3) == mx && s.getDouble(4) == sq)
    }
  }

  test("group_level on [year, month] array keys") {
    val v = View(orders, $"o_orderkey",
      array(year($"o_orderdate").cast("double"), month($"o_orderdate").cast("double")),
      lit(1L), Some(Reduce.Count))
    val byYear = v.query(QueryOpts(groupLevel = Some(1))).collect()
    val expYear = orders.groupBy(year($"o_orderdate")).count().collect()
      .map(r => r.getInt(0).toDouble -> r.getLong(1)).toMap
    assert(byYear.length == expYear.size)
    byYear.foreach { r =>
      val k = r.getSeq[Double](0)
      assert(k.length == 1 && r.getLong(1) == expYear(k.head))
    }
    // keys in ascending collation order
    val years = byYear.map(_.getSeq[Double](0).head).toSeq
    assert(years == years.sorted)
  }

  test("startkey/endkey range with inclusive_end variants") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    def ids(o: QueryOpts) = v.query(o.copy(reduce = false)).collect().map(_.getLong(0)).toSet
    val all = ids(QueryOpts())
    val incl = ids(QueryOpts(startKey = Some("F"), endKey = Some("O")))
    val excl = ids(QueryOpts(startKey = Some("F"), endKey = Some("O"), inclusiveEnd = false))
    val expIncl = orders.filter($"o_orderstatus" >= "F" && $"o_orderstatus" <= "O")
      .select($"o_orderkey").as[Long].collect().toSet
    val expExcl = orders.filter($"o_orderstatus" >= "F" && $"o_orderstatus" < "O")
      .select($"o_orderkey").as[Long].collect().toSet
    assert(incl == expIncl && excl == expExcl && all.size >= incl.size)
  }

  test("array-prefix endkey with MaxKey sentinel") {
    val v = View(orders, $"o_orderkey",
      array(year($"o_orderdate").cast("double"), month($"o_orderdate").cast("double")), lit(1))
    val got = v.query(QueryOpts(
      startKey = Some(Seq(1996.0)),
      endKey = Some(Seq(1996.0, MaxKey)), reduce = false)).collect()
    val exp = orders.filter(year($"o_orderdate") === 1996).count()
    assert(got.length == exp.toInt)
  }

  test("descending + limit + skip") {
    val v = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
    val got = v.query(QueryOpts(descending = true, limit = Some(5), skip = 2, reduce = false))
      .collect().map(_.getDouble(1)).toSeq
    val exp = orders.orderBy($"o_totalprice".desc, $"o_orderkey".desc)
      .select($"o_totalprice").as[Double].collect().slice(2, 7).toSeq
    assert(got == exp)
  }

  test("key= and keys= lookups") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val one = v.query(QueryOpts(key = Some("F"), reduce = false)).count()
    assert(one == orders.filter($"o_orderstatus" === "F").count())
    val two = v.query(QueryOpts(keys = Some(Seq("F", "O")), reduce = false)).count()
    assert(two == orders.filter($"o_orderstatus".isin("F", "O")).count())
  }

  test("keys= returns groups in requested order and honors repeats") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val got = v.query(QueryOpts(keys = Some(Seq("O", "F")), reduce = false))
      .select($"key").as[String].collect()
    val nO = orders.filter($"o_orderstatus" === "O").count().toInt
    assert(got.take(nO).forall(_ == "O") && got.drop(nO).forall(_ == "F"))
    // a repeated key duplicates its row group
    val rep = v.query(QueryOpts(keys = Some(Seq("F", "F")), reduce = false)).count()
    assert(rep == 2 * orders.filter($"o_orderstatus" === "F").count())
  }

  test("group_level=0 is the global reduce with a null key") {
    val v = View(orders, $"o_orderkey",
      array(year($"o_orderdate").cast("double")), lit(1L), Some(Reduce.Count))
    val r = v.query(QueryOpts(groupLevel = Some(0))).collect()
    assert(r.length == 1 && r(0).isNullAt(0) && r(0).getLong(1) == orders.count())
  }

  test("union views reject includeDocs with a clear error") {
    val va = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
    val vb = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val e = intercept[IllegalArgumentException] {
      View.union(va, vb).query(QueryOpts(reduce = false, includeDocs = true))
    }
    assert(e.getMessage.contains("union views"))
  }

  test("include_docs joins the source document and preserves key order") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val r = v.query(QueryOpts(reduce = false, includeDocs = true, limit = Some(3))).collect()
    r.foreach { row =>
      val doc = row.getAs[Row]("doc")
      assert(doc.getAs[Long]("o_orderkey") == row.getLong(0))
    }
    // order guarantee survives the doc join (descending + skip + limit)
    val v2 = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
    val got = v2.query(QueryOpts(descending = true, skip = 2, limit = Some(3),
      reduce = false, includeDocs = true)).collect().map(_.getDouble(1)).toSeq
    val exp = orders.orderBy($"o_totalprice".desc, $"o_orderkey".desc)
      .select($"o_totalprice").as[Double].collect().slice(2, 5).toSeq
    assert(got == exp)
  }

  test("linked documents: value {_id} pulls the linked doc") {
    // orders emit value {_id: o_custkey}; include_docs resolves the customer.
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val v = View(customer, $"c_custkey", $"c_name",
      struct($"c_nationkey".as("_id")))
    val r = v.query(QueryOpts(reduce = false, includeDocs = true, limit = Some(5)))
    // linked doc is the nation... need docs table = customer; link points into same docs
    // here _id refers to c_custkey space; craft: link every customer to customer 1
    val v2 = View(customer, $"c_custkey", $"c_name", struct(lit(1L).as("_id")))
    val rows = v2.query(QueryOpts(reduce = false, includeDocs = true, limit = Some(4))).collect()
    rows.foreach { row =>
      assert(row.getAs[Row]("doc").getAs[Long]("c_custkey") == 1L)
    }
    assert(r.count() == 5)
  }

  test("multi-emit explodes into several view rows per doc") {
    val v = View.multi(orders, $"o_orderkey",
      array(
        struct($"o_orderstatus".as("key"), $"o_totalprice".as("value")),
        struct($"o_orderpriority".as("key"), $"o_totalprice".as("value"))),
      Some(Reduce.Count))
    assert(v.totalRows == orders.count() * 2)
  }

  test("View.union merges mixed-key views in cross-type collation order") {
    val va = View(orders.filter($"o_orderstatus" === "F"), $"o_orderkey",
      $"o_totalprice", lit(1))
    val vb = View(orders.filter($"o_orderstatus" === "O"), $"o_orderkey",
      $"o_orderpriority", lit(1))
    val rows = View.union(va, vb)
      .query(QueryOpts(reduce = false)).select($"key").as[String].collect()
    val nF = orders.filter($"o_orderstatus" === "F").count().toInt
    // all number keys sort before all string keys
    rows.take(nF).foreach(k => assert(!k.contains("\"key\":\""), "numbers first"))
    rows.drop(nF).foreach(k => assert(k.contains("\"key\":\""), "strings after"))
    // numbers ascend
    val nums = rows.take(nF).map(k => k.stripPrefix("{\"key\":").stripSuffix("}").toDouble)
    assert(nums.toSeq == nums.sorted.toSeq)
  }

  test("startkey_docid / endkey_docid paginate within duplicate keys") {
    // keys = o_orderstatus (heavily duplicated); docid = o_orderkey
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val fIds = orders.filter($"o_orderstatus" === "F")
      .select($"o_orderkey").as[Long].collect().sorted
    val resumeAt = fIds(fIds.length / 2)
    val got = v.query(QueryOpts(startKey = Some("F"), endKey = Some("F"),
      startKeyDocId = Some(resumeAt), reduce = false))
      .select($"id").as[Long].collect().toSeq
    assert(got == fIds.dropWhile(_ < resumeAt).toSeq)
    // descending: startkey is the upper bound, docid bounds from above
    val gotDesc = v.query(QueryOpts(startKey = Some("F"), endKey = Some("F"),
      startKeyDocId = Some(resumeAt), descending = true, reduce = false))
      .select($"id").as[Long].collect().toSeq
    assert(gotDesc == fIds.takeWhile(_ <= resumeAt).reverse.toSeq)
    // endkey_docid caps the id range at the end key
    val gotEnd = v.query(QueryOpts(startKey = Some("F"), endKey = Some("F"),
      endKeyDocId = Some(resumeAt), reduce = false))
      .select($"id").as[Long].collect().toSeq
    assert(gotEnd == fIds.takeWhile(_ <= resumeAt).toSeq)
  }

  test("inclusive_end=false + endkey_docid excludes the boundary row") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val fIds = orders.filter($"o_orderstatus" === "F")
      .select($"o_orderkey").as[Long].collect().sorted
    val bound = fIds(fIds.length / 2)
    // ascending: rows AT (F, bound) must be excluded, ids below kept
    val asc = v.query(QueryOpts(startKey = Some("F"), endKey = Some("F"),
      endKeyDocId = Some(bound), inclusiveEnd = false, reduce = false))
      .select($"id").as[Long].collect().toSeq
    assert(asc == fIds.takeWhile(_ < bound).toSeq)
    // descending: endkey bounds from below; the boundary id is excluded
    val desc = v.query(QueryOpts(startKey = Some("F"), endKey = Some("F"),
      endKeyDocId = Some(bound), inclusiveEnd = false, descending = true,
      reduce = false)).select($"id").as[Long].collect().toSeq
    assert(desc == fIds.dropWhile(_ <= bound).reverse.toSeq)
  }

  test("reduced keys= returns one row per requested key in request order") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1L),
      Some(Reduce.Count))
    val exp = orders.groupBy($"o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = v.query(QueryOpts(keys = Some(Seq("O", "F", "O"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("O" -> exp("O"), "F" -> exp("F"), "O" -> exp("O")))
  }

  test("_approx_count_distinct builtin: error bound + sketch-union rereduce") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", $"o_custkey",
      Some(Reduce.ApproxCountDistinct()))
    val exact = orders.groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = v.query(QueryOpts(group = true)).collect()
      .map(r => r.getString(0) -> r.getStruct(1).getLong(0)).toMap
    got.foreach { case (k, est) =>
      assert(math.abs(est.toDouble - exact(k)) / exact(k) < 0.05,
        s"$k: est=$est exact=${exact(k)}")
    }
    // materialized reduced index: group=true serves the stored sketches;
    // the global rollup REREDUCES by sketch union, never touching raw rows
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString
    val path = s"$dir/v"
    v.materialize(path, numBuckets = 4)
    v.materializeReduced(spark, path)
    val rv = v.fromReducedIndex(spark, path)
    val served = rv.query(QueryOpts(group = true)).collect()
      .map(r => r.getString(0) -> r.getStruct(1).getLong(0)).toMap
    assert(served == got, "stored per-key estimates differ from raw path")
    val exactAll = orders.select(countDistinct($"o_custkey")).as[Long].head()
    val global = rv.query().collect().head.getStruct(1).getLong(0)
    assert(math.abs(global.toDouble - exactAll) / exactAll < 0.05,
      s"union rollup: est=$global exact=$exactAll")
  }

  test("queryResult carries total_rows and offset metadata") {
    val v = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val r = v.queryResult(QueryOpts(reduce = false, skip = 5, limit = Some(10)))
    assert(r.totalRows == orders.count())
    assert(r.offset == 5)
    assert(r.rows.count() == 10)
  }

  test("totalRows on an unmaterialized view counts the map phase only once") {
    // instrument the source with a per-row accumulator; nondeterministic
    // so Catalyst can never prune or collapse the probe away
    val acc = spark.sparkContext.longAccumulator("map-phase-rows")
    val n = 1000L
    val touch = udf { (_: Long) => acc.add(1L); true }.asNondeterministic()
    val docs = spark.range(n).filter(touch($"id"))
      .select($"id", ($"id" % 10).cast("double").as("g"))
    val v = View(docs, $"id", $"g", lit(1))
    // first envelope: one pass for total_rows + one for the rows
    val r1 = v.queryResult(QueryOpts(reduce = false))
    assert(r1.rows.count() == n)
    val afterFirst = acc.value
    assert(afterFirst == 2 * n,
      s"first envelope = count pass + rows pass, got $afterFirst")
    // second envelope: total_rows is served from the cached count —
    // ONLY the rows pass runs
    val r2 = v.queryResult(QueryOpts(reduce = false))
    assert(r2.rows.count() == n)
    assert(acc.value - afterFirst == n,
      s"second envelope must not re-run the map phase for total_rows: " +
        s"${acc.value - afterFirst} extra rows touched")
    assert(r1.totalRows == n && r2.totalRows == n)
  }

  test("locale=true view orders accented keys with their base letter") {
    val docs = Seq((1L, "zebra"), (2L, "été"), (3L, "eager"), (4L, "fig"))
      .toDF("id", "w")
    val v = View(docs, $"id", $"w", lit(1), locale = true)
    val keys = v.query(QueryOpts(reduce = false))
      .select($"key").as[String].collect().toSeq
    assert(keys == Seq("eager", "été", "fig", "zebra"))
    // range bounds encode with the same collator: [e, f) captures both
    // e-words including the accented one
    val r = v.query(QueryOpts(startKey = Some("e"), endKey = Some("f"),
      inclusiveEnd = false, reduce = false))
      .select($"key").as[String].collect().toSeq
    assert(r == Seq("eager", "été"))
  }

  test("design doc: grouped views build, update and reopen together") {
    import graft.view.DesignDoc
    val dir = java.nio.file.Files.createTempDirectory("graft-ddoc").toString
    val root = s"$dir/ddoc"
    val dd = new DesignDoc(Map(
      "by_status" -> View(orders, $"o_orderkey", $"o_orderstatus",
        $"o_totalprice".cast("double"), Some(Reduce.Sum)),
      "by_price" -> View(orders, $"o_orderkey", $"o_totalprice", lit(1))))
    dd.materialize(root, numBuckets = 4, seq = 1)
    val opened = dd.open(spark, root)
    assert(opened.values.forall(_.updateSeq.contains(1L)))
    // one update pass advances BOTH views' indexes
    val changed = orders.orderBy($"o_orderkey".asc).limit(1)
      .withColumn("o_totalprice", lit(123456.0))
    dd.update(spark, root, changed, newSeq = 2)
    val reopened = dd.open(spark, root)
    assert(reopened.values.forall(_.updateSeq.contains(2L)))
    val id = changed.select($"o_orderkey").as[Long].head()
    assert(reopened("by_price").rows.filter($"_id" === id)
      .select($"key").as[Double].head() == 123456.0)
    assert(dd.cleanup(spark, root))
  }

  test("ddoc _info: meta scalars per view, unmaterialized views report absent") {
    import graft.view.DesignDoc
    val dir = java.nio.file.Files.createTempDirectory("graft-dinfo").toString
    val root = s"$dir/ddoc"
    val dd = new DesignDoc(Map(
      "by_status" -> View(orders, $"o_orderkey", $"o_orderstatus", lit(1)),
      "by_price" -> View(orders, $"o_orderkey", $"o_totalprice", lit(1))))
    dd.materialize(root, numBuckets = 4, seq = 9)
    val withGhost = new DesignDoc(dd.views +
      ("zz_new" -> View(orders, $"o_orderkey", $"o_orderdate", lit(1))))
    val got = withGhost.info(spark, root).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2),
        r.getLong(4), r.getLong(5) > 0)).toSeq
    assert(got == Seq(("by_price", true, 9L, 4L, true),
      ("by_status", true, 9L, 4L, true),
      ("zz_new", false, -1L, -1L, false)), s"info wrong: $got")
  }

  test("viewCleanup: removes only orphaned view indexes, idempotent") {
    import graft.view.{DesignDoc, IndexStore}
    val dir = java.nio.file.Files.createTempDirectory("graft-vcln").toString
    val root = s"$dir/ddoc"
    val full = new DesignDoc(Map(
      "by_status" -> View(orders, $"o_orderkey", $"o_orderstatus", lit(1)),
      "by_price" -> View(orders, $"o_orderkey", $"o_totalprice", lit(1)),
      "by_clerk" -> View(orders, $"o_orderkey", $"o_orderpriority", lit(1))))
    full.materialize(root, numBuckets = 4, seq = 1)
    // the ddoc edit drops by_clerk; cleanup reclaims exactly its index
    val trimmed = new DesignDoc(full.views - "by_clerk")
    assert(trimmed.viewCleanup(spark, root) == Seq("by_clerk"))
    assert(!IndexStore.exists(spark, s"$root/by_clerk"))
    assert(IndexStore.exists(spark, s"$root/by_status") &&
      IndexStore.exists(spark, s"$root/by_price"))
    // survivors still serve, and a second run removes nothing
    val n = orders.count()
    assert(trimmed.open(spark, root)("by_price")
      .query(QueryOpts(reduce = false)).count() == n)
    assert(trimmed.viewCleanup(spark, root).isEmpty)
    // a missing root is a clean no-op, not an error
    assert(trimmed.viewCleanup(spark, s"$dir/nowhere").isEmpty)
  }

  test("queryPage: keyset resume survives an interleaved index update") {
    import graft.view.ResumeToken
    val dir = java.nio.file.Files.createTempDirectory("graft-page").toString
    val path = s"$dir/v"
    val v = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
    v.materialize(path, numBuckets = 4, seq = 1)
    val vi = v.fromIndex(spark, path)
    val p1 = vi.queryPage(pageSize = 100)
    val served = p1.rows.select($"id").as[Long].collect().toSeq
    assert(served.length == 100 && p1.nextToken.isDefined)
    assert(ResumeToken.seqOf(p1.nextToken.get) == 1L)
    // delete an ALREADY-SERVED doc between pages: offset pagination
    // would shift the remaining rows and silently drop one
    val victim = served.head
    v.updateIndex(spark, path, orders.limit(0), deletedIds = Seq(victim),
      newSeq = 2)
    val vi2 = v.fromIndex(spark, path)
    val rest = scala.collection.mutable.ArrayBuffer[Long]()
    var token = p1.nextToken
    while (token.isDefined) {
      val p = vi2.queryPage(pageSize = 100, resume = token)
      rest ++= p.rows.select($"id").as[Long].collect()
      token = p.nextToken
    }
    val all = served ++ rest
    assert(all.size == all.toSet.size, "a row was served twice")
    assert(all.toSet ==
      orders.select($"o_orderkey").as[Long].collect().toSet,
      "a row was skipped") // every order exactly once across pages
    // pages continue in collation order across the resume boundary
    val prices = orders.filter(!$"o_orderkey".isin(served: _*))
      .orderBy($"o_totalprice", $"o_orderkey")
      .select($"o_orderkey").as[Long].collect().toSeq
    assert(rest.toSeq == prices)
  }

  test("queryPage: reduced group=true pages equal the unpaged query") {
    import graft.view.ResumeToken
    val dir = java.nio.file.Files.createTempDirectory("graft-gpage")
      .toString
    val path = s"$dir/v"
    // many distinct keys: one group per order key
    val v = View(orders, $"o_orderkey", $"o_orderkey".cast("double"),
      $"o_totalprice".cast("decimal(18,2)"), Some(Reduce.Sum))
    v.materialize(path, numBuckets = 4, seq = 1)
    val vi = v.fromIndex(spark, path)
    val opts = QueryOpts(group = true)
    val unpaged = vi.query(opts).collect()
      .map(r => r.getDouble(0) -> r.get(1)).toSeq

    val p1 = vi.queryPage(opts, pageSize = 70)
    val first = p1.rows.collect().map(r => r.getDouble(0) -> r.get(1)).toSeq
    assert(first.length == 70 && p1.nextToken.isDefined)
    assert(ResumeToken.seqOf(p1.nextToken.get) == 1L)

    // interleave an update that changes an ALREADY-SERVED group's value
    // and deletes another served group: rows ahead of the cursor must
    // not shift, skip, or duplicate
    val servedKeys = first.map(_._1.toLong)
    val changed = orders.filter($"o_orderkey" === servedKeys.head)
      .withColumn("o_totalprice", lit(999999.0))
    v.updateIndex(spark, path, changed,
      deletedIds = Seq(servedKeys(1)), newSeq = 2)
    val vi2 = v.fromIndex(spark, path)

    val rest = scala.collection.mutable.ArrayBuffer[(Double, Any)]()
    var token = p1.nextToken
    var guard = 0
    while (token.isDefined && guard < 1000) {
      val p = vi2.queryPage(opts, pageSize = 70, resume = token)
      rest ++= p.rows.collect().map(r => r.getDouble(0) -> r.get(1))
      token = p.nextToken
      guard += 1
    }
    val all = first ++ rest
    assert(all.map(_._1).distinct.length == all.length,
      "a group was served twice")
    // pages before the update + pages after == the ORIGINAL unpaged
    // groups for the tail (groups past the cursor were untouched)
    assert(all.toMap.keySet == unpaged.toMap.keySet,
      "a group was skipped or invented")
    assert(rest.toSeq ==
      unpaged.filter(_._1 > first.last._1), "tail pages diverged")

    // group_level pages too: array keys rolled to level 1
    val va = View(orders, $"o_orderkey",
      array(year($"o_orderdate").cast("double"),
        month($"o_orderdate").cast("double")),
      lit(1L), Some(Reduce.Count))
    val lv = QueryOpts(groupLevel = Some(1))
    val unpagedL = va.query(lv).collect().map(_.toString).toSeq
    val pagedL = scala.collection.mutable.ArrayBuffer[String]()
    var tok: Option[String] = None
    var first2 = true
    while (first2 || tok.isDefined) {
      val p = va.queryPage(lv, pageSize = 3, resume = tok)
      pagedL ++= p.rows.collect().map(_.toString)
      tok = p.nextToken
      first2 = false
    }
    assert(pagedL.toSeq == unpagedL, "group_level paging diverged")
  }

  test("sorted=false: same rows, no global sort in the plan") {
    val v = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
    val opts = QueryOpts(reduce = false,
      startKey = Some(1000.0), endKey = Some(50000.0))
    val sortedRows = v.query(opts)
    val unsorted = v.query(opts.copy(sorted = false))
    assert(unsorted.collect().map(_.getLong(0)).toSet ==
      sortedRows.collect().map(_.getLong(0)).toSet,
      "sorted=false must return the same row set")
    def hasSort(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort])
    assert(hasSort(sortedRows), "default query must sort")
    assert(!hasSort(unsorted), "sorted=false must not plan a sort")
    // order-dependent options keep their order even with sorted=false
    val desc = v.query(opts.copy(sorted = false, descending = true,
      limit = Some(10)))
    val ks = desc.select($"key").as[Double].collect()
    assert(ks.sameElements(ks.sorted.reverse))
  }

  test("attachments: put/get/remove round-trip; include_docs stubs by default") {
    import graft.view.Attachments
    val docs0 = Seq((1L, "alpha"), (2L, "bravo-longer")).toDF("id", "txt")
    val docs = Attachments.put(
      Attachments.put(docs0, "body", encode($"txt", "UTF-8"), "text/plain"),
      "meta", encode(lit("m"), "UTF-8"), "application/json")
    // put upserts: replacing an existing name keeps map size at 2
    val docs2 = Attachments.put(docs, "body",
      encode(lit("replaced"), "UTF-8"), "text/plain")
    assert(docs2.select(size(map_keys(col(Attachments.ATT))))
      .as[Int].collect().forall(_ == 2))
    assert(docs2.filter($"id" === 1)
      .select(decode(element_at(col(Attachments.ATT), "body")
        .getField("data"), "UTF-8")).as[String].head() == "replaced")
    // getAttachment surface: entry with digest + length + bytes
    val got = Attachments.get(docs, $"id", "body")
      .filter($"_id" === 2).select($"attachment.*").head()
    assert(got.getAs[Long]("length") == "bravo-longer".length.toLong)
    assert(got.getAs[String]("digest").startsWith("md5-"))
    assert(new String(got.getAs[Array[Byte]]("data"), "UTF-8")
      == "bravo-longer")
    assert(!got.getAs[Boolean]("stub"))
    // removeAttachment drops only that name
    val removed = Attachments.remove(docs, "meta")
    assert(removed.select(map_keys(col(Attachments.ATT)))
      .as[Seq[String]].collect().forall(_ == Seq("body")))

    // include_docs: default response carries STUBS (no payload bytes);
    // attachments=true ships the data — the reference's two shapes
    val v = View(docs, $"id", $"txt", lit(1))
    val stub = v.query(QueryOpts(reduce = false, includeDocs = true))
      .filter($"id" === 1)
      .select(element_at($"doc._attachments", "body").as("a"))
      .select($"a.*").head()
    assert(stub.getAs[Boolean]("stub") && stub.isNullAt(stub.fieldIndex("data")))
    assert(stub.getAs[Long]("length") == "alpha".length.toLong)
    assert(stub.getAs[String]("digest").startsWith("md5-"))
    val full = v.query(QueryOpts(reduce = false, includeDocs = true,
        attachments = true))
      .filter($"id" === 1)
      .select(element_at($"doc._attachments", "body").as("a"))
      .select($"a.*").head()
    assert(!full.getAs[Boolean]("stub"))
    assert(new String(full.getAs[Array[Byte]]("data"), "UTF-8") == "alpha")
    // stub and full agree on the metadata (digest is over the same bytes)
    assert(stub.getAs[String]("digest") == full.getAs[String]("digest"))
  }

  test("attachment gzip tier: encode on store, decode on read, stubs carry encoding info") {
    import graft.view.Attachments
    val txt = ("repeat me " * 40).trim
    val docs0 = Seq((1L, txt)).toDF("id", "txt")
    // compressible type: stored gzip'd, length/digest stay DECODED
    val enc = Attachments.putEncoded(docs0, "body",
      encode($"txt", "UTF-8"), "text/plain; charset=utf-8")
    val e = Attachments.get(enc, $"id", "body")
      .select($"attachment.*").head()
    assert(e.getAs[String]("encoding") == "gzip")
    assert(e.getAs[Long]("length") == txt.length.toLong)
    assert(e.getAs[Long]("encoded_length") <
      e.getAs[Long]("length"),
      "a repetitive text payload must shrink under gzip")
    assert(e.getAs[Long]("encoded_length") ==
      e.getAs[Array[Byte]]("data").length.toLong,
      "stored bytes ARE the encoded form")
    // the decode read round-trips bit-exact and matches the digest
    val dec = Attachments.getDecoded(enc, $"id", "body").head()
    val payload = dec.getAs[Array[Byte]]("data")
    assert(new String(payload, "UTF-8") == txt)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map(b => f"$b%02x").mkString
    assert(e.getAs[String]("digest") == s"md5-$md",
      "digest must describe the DECODED payload")
    // non-compressible type: putEncoded == put (identity storage)
    val img = Attachments.putEncoded(docs0, "pic",
      encode($"txt", "UTF-8"), "image/png")
    val pe = Attachments.get(img, $"id", "pic")
      .select($"attachment.*").head()
    assert(pe.isNullAt(pe.fieldIndex("encoding")))
    assert(new String(Attachments.getDecoded(img, $"id", "pic")
      .head().getAs[Array[Byte]]("data"), "UTF-8") == txt,
      "identity entries pass through the decode read unchanged")
    // include_docs stubs keep the encoding info (a client sizes its
    // fetch from the stub, CouchDB's att_encoding_info shape)
    val stub = View(enc, $"id", $"txt", lit(1))
      .query(QueryOpts(reduce = false, includeDocs = true))
      .select(element_at($"doc._attachments", "body").as("a"))
      .select($"a.*").head()
    assert(stub.getAs[Boolean]("stub") &&
      stub.isNullAt(stub.fieldIndex("data")))
    assert(stub.getAs[String]("encoding") == "gzip")
    assert(stub.getAs[Long]("encoded_length") ==
      e.getAs[Long]("encoded_length"))
  }

  test("chunked attachments: uneven chunks recompose bit-exact; gaps refuse") {
    import graft.view.Attachments
    val docs0 = Seq(
      (1L, "0123456789abcdef012"), // 19 bytes -> chunks of 7: 7,7,5
      (2L, "short"),               // 5 bytes  -> 1 chunk
      (3L, "")                     // empty    -> 1 empty chunk
    ).toDF("id", "txt")
    val ch = Attachments.chunkRows(docs0, $"id",
      encode($"txt", "UTF-8"), "body", "text/plain", chunkSize = 7)
    val perDoc = ch.groupBy($"doc_id").count().as[(Long, Long)]
      .collect().toMap
    assert(perDoc == Map(1L -> 3L, 2L -> 1L, 3L -> 1L), s"chunking: $perDoc")
    // no chunk exceeds the chunk size; every chunk carries its digest
    assert(ch.filter(octet_length($"data") > 7).count() == 0)
    assert(ch.filter(!$"chunk_digest".startsWith("md5-")).count() == 0)

    // reassembly equals the original bytes AND the single-cell digest
    val re = Attachments.reassemble(ch)
    val byId = re.collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    val single = Attachments.put(docs0, "body",
        encode($"txt", "UTF-8"), "text/plain")
      .select($"id", element_at(col(Attachments.ATT), "body").as("a"))
      .collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val got = byId(id)
      val exp = single(id)
      assert(got.getAs[String]("digest") == exp.getAs[String]("digest"),
        s"doc $id digest diverged after the chunk cycle")
      assert(got.getAs[Long]("length") == exp.getAs[Long]("length"))
      assert(java.util.Arrays.equals(got.getAs[Array[Byte]]("data"),
        exp.getAs[Array[Byte]]("data")))
    }

    // a missing chunk makes the payload unservable, and integrity
    // reports exactly that (doc, name)
    val gappy = ch.filter(!($"doc_id" === 1L && $"chunk_idx" === 1))
    assert(Attachments.reassemble(gappy).filter($"doc_id" === 1L)
      .count() == 0, "incomplete payload must not serve")
    val bad = Attachments.chunkIntegrity(gappy).collect()
    assert(bad.length == 1 && bad(0).getAs[Long]("doc_id") == 1L &&
      bad(0).getAs[Long]("expected") == 3L &&
      bad(0).getAs[Long]("stored") == 2L)
    // a duplicated chunk equally refuses (exactly-once, not at-least-once)
    val dup = ch.unionByName(ch.filter($"doc_id" === 2L))
    assert(Attachments.reassemble(dup).filter($"doc_id" === 2L)
      .count() == 0, "duplicated chunks must not serve")

    // a NULL payload is NO attachment: zero chunk rows, not a phantom
    // row with null data/digest
    val withNull = Seq((9L, null.asInstanceOf[String])).toDF("id", "txt")
    assert(Attachments.chunkRows(withNull, $"id",
      encode($"txt", "UTF-8"), "body", "text/plain", 7).count() == 0)

    // integrity reports on the SAME (doc, name, content_type) grain
    // reassemble serves: two complete chunk sets under one name but
    // different content types are each servable — integrity is clean
    val twoTypes = Attachments.chunkRows(docs0.filter($"id" === 2L), $"id",
        encode($"txt", "UTF-8"), "body", "text/plain", 7)
      .unionByName(Attachments.chunkRows(docs0.filter($"id" === 2L), $"id",
        encode($"txt", "UTF-8"), "body", "application/json", 7))
    assert(Attachments.reassemble(twoTypes).count() == 2)
    assert(Attachments.chunkIntegrity(twoTypes).count() == 0,
      "per-content-type-complete chunk sets must not be flagged")
  }

  test("materialize + fromIndex + incremental updateIndex") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val path = s"$dir/v1"
    val v = View(orders, $"o_orderkey", $"o_orderstatus",
      $"o_totalprice".cast("decimal(18,2)"), Some(Reduce.Sum))
    v.materialize(path)
    val vi = v.fromIndex(spark, path)
    val a = vi.query(QueryOpts(group = true)).collect().map(_.toSeq).toSet
    val b = v.query(QueryOpts(group = true)).collect().map(_.toSeq).toSet
    assert(a == b)
    // incremental: change one order's price; index must reflect only that
    val changed = orders.limit(1).withColumn("o_totalprice", lit(999999.0))
    v.updateIndex(spark, path, changed)
    val vi2 = v.fromIndex(spark, path)
    assert(vi2.totalRows == orders.count())
    val changedKey = changed.select($"o_orderkey").as[Long].head()
    val row = vi2.rows.filter($"_id" === changedKey).collect()
    assert(row.length == 1 && row(0).getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("999999.00")) == 0)
  }

  test("allDocs: the primary index under the full envelope") {
    val v = View.allDocs(orders, $"o_orderkey")
    // ranged ascending page in id order
    val page = v.query(QueryOpts(startKey = Some(100L),
        endKey = Some(120L), reduce = false))
      .select($"key".cast("long")).as[Long].collect().toSeq
    val want = orders.filter($"o_orderkey".between(100L, 120L))
      .select($"o_orderkey").as[Long].collect().sorted.toSeq
    assert(page == want && page.nonEmpty)
    // keys= is the bulk-get: requested order, repeats honored
    val some = want.take(2)
    val got = v.query(QueryOpts(
        keys = Some(Seq(some(1), some(0), some(1))), reduce = false))
      .select($"key".cast("long")).as[Long].collect().toSeq
    assert(got == Seq(some(1), some(0), some(1)))
    // include_docs: the joined doc is the row's own document
    val wd = v.query(QueryOpts(key = Some(some.head),
      includeDocs = true, reduce = false))
    assert(wd.columns.contains("doc"))
    val r0 = wd.select($"id".cast("long"), $"doc.o_orderkey").head()
    assert(r0.getLong(0) == some.head && r0.getLong(1) == some.head)
  }

  test("conflicts=true attaches the losing-live rev set to served docs") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    // doc 1: two live leaves (conflict), doc 2: live beats deleted
    // (clean), doc 3: no leaves at all
    val leaves = Seq(
      (1L, 2L, "bbb", false), (1L, 2L, "aaa", false),
      (2L, 3L, "win", false), (2L, 1L, "old", true))
      .toDF("id", "pos", "hash", "del")
    val v = View(docs, col("id"), col("name"), lit(1))
      .withConflicts(leaves, col("id"), col("pos"), col("hash"), col("del"))
    val got = v.query(QueryOpts(reduce = false, includeDocs = true,
        conflicts = true))
      .select(col("id"), col("doc._conflicts").as("c"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[String]]("c").toSeq).toMap
    // doc 1's winner is 2-bbb (greater hash); 2-aaa is the conflict
    assert(got(1L) == Seq("2-aaa"), s"doc 1: ${got(1L)}")
    assert(got(2L) == Nil, "a live winner over a deleted leaf is clean")
    assert(got(3L) == Nil, "a doc with no leaves serves an empty set")
    // conflicts without attached revisions fails loudly
    val bare = View(docs, col("id"), col("name"), lit(1))
    val e = intercept[IllegalStateException](
      bare.query(QueryOpts(reduce = false, includeDocs = true,
        conflicts = true)).collect())
    assert(e.getMessage.contains("withConflicts"))
    // conflicts=false leaves the doc shape untouched
    assert(!v.query(QueryOpts(reduce = false, includeDocs = true))
      .schema("doc").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("_conflicts"))
  }

  test("queryMany: N range queries == per-query answers, ONE scan, per-q direction/skip/limit") {
    val v = View(orders, $"o_orderkey", $"o_totalprice", $"o_orderpriority")
    val qs = Seq(
      QueryOpts(startKey = Some(100000.0), endKey = Some(200000.0),
        reduce = false),
      // overlapping range, descending with limit+skip
      QueryOpts(startKey = Some(250000.0), endKey = Some(150000.0),
        descending = true, limit = Some(40), skip = 3, reduce = false),
      // point lookup on a key that exists
      QueryOpts(key = Some(orders.orderBy($"o_orderkey")
        .select($"o_totalprice").as[Double].head()), reduce = false),
      // exclusive end
      QueryOpts(startKey = Some(300000.0), endKey = Some(320000.0),
        inclusiveEnd = false, reduce = false))
    val many = v.queryMany(qs)
    val got = many.collect().groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(r =>
        (r.getLong(1), r.getDouble(2), r.getString(3))).toSeq }
    qs.zipWithIndex.foreach { case (o, i) =>
      val want = v.query(o).collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      assert(got.getOrElse(i, Seq.empty) == want,
        s"query $i: ${got.getOrElse(i, Seq.empty).size} rows != " +
          s"${want.size} (per-query)")
      assert(want.nonEmpty, s"query $i must select rows for the test to bite")
    }
    // the whole batch reads the corpus ONCE (one scan, not 4); count in
    // the plan string — AQE query-stage boundaries hide the scan nodes
    // from plan.collect once executed
    val planStr = many.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0) // AQE toString repeats the plan
    val nScans = "FileScan parquet".r.findAllMatchIn(planStr).size
    assert(nScans == 1,
      s"expected ONE scan for the batch, got $nScans:\n$planStr")
  }

  test("queryMany on a materialized index prunes to the UNION of bucket ranges") {
    val dir = java.nio.file.Files.createTempDirectory("view-qmany").toString
    val v0 = View(orders, $"o_orderkey", $"o_totalprice", lit(1))
    v0.materialize(s"$dir/idx", numBuckets = 16)
    val v = v0.fromIndex(spark, s"$dir/idx")
    val qs = Seq(
      QueryOpts(startKey = Some(50000.0), endKey = Some(80000.0),
        reduce = false),
      QueryOpts(startKey = Some(400000.0), endKey = Some(450000.0),
        reduce = false))
    val many = v.queryMany(qs)
    val plan = many.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_kb"),
      s"multi-range scan must keep _kb pruning:\n$plan")
    qs.zipWithIndex.foreach { case (o, i) =>
      val want = v.query(o).collect().map(_.toString).toSeq
      val got = many.filter(col("q") === i).drop("q").collect()
        .map(_.toString).toSeq
      assert(got == want && want.nonEmpty, s"indexed query $i mismatch")
    }
    // one unbounded query in the batch drops bucket pruning (it must
    // read everything) but answers stay right
    val qs2 = qs :+ QueryOpts(reduce = false)
    val many2 = v.queryMany(qs2)
    assert(many2.filter(col("q") === 2).count() == orders.count())
  }

  test("queryMany fallback: reduced/keys= batches dispatch per-query; mixed shapes refuse") {
    val vr = View(orders, $"o_orderkey", $"o_orderstatus", lit(1),
      Some(Reduce.Count))
    val qs = Seq(QueryOpts(group = true),
      QueryOpts(group = true, descending = true))
    val many = vr.queryMany(qs).collect()
    val g0 = many.filter(_.getInt(2) == 0).map(r =>
      (r.getString(0), r.getLong(1))).toSeq
    val want0 = vr.query(QueryOpts(group = true)).collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq
    assert(g0 == want0 && want0.nonEmpty)
    // mixed reduced + map-row refuses loudly
    val e = intercept[IllegalArgumentException](
      vr.queryMany(Seq(QueryOpts(group = true), QueryOpts(reduce = false))))
    assert(e.getMessage.contains("cannot mix"))
    // keys= rides the fallback and keeps request order
    val vk = View(orders, $"o_orderkey", $"o_orderstatus", lit(1))
    val kq = vk.queryMany(Seq(
      QueryOpts(keys = Some(Seq("O", "F")), reduce = false)))
    assert(kq.select("q").distinct().collect().map(_.getInt(0)).toSeq ==
      Seq(0))
    assert(kq.count() == orders.filter($"o_orderstatus".isin("O", "F"))
      .count())
    // _all_docs/queries: the same batching composes over View.allDocs
    val ad = View.allDocs(orders.withColumn("_id",
      concat(lit("o"), $"o_orderkey")), col("_id"))
    val adOut = ad.queryMany(Seq(
      QueryOpts(reduce = false, startKey = Some("o1"), endKey = Some("o2"),
        limit = Some(25)),
      QueryOpts(reduce = false, startKey = Some("o5"), endKey = Some("o6"))))
    Seq(0, 1).foreach { i =>
      val want = ad.query(
        if (i == 0) QueryOpts(reduce = false, startKey = Some("o1"),
          endKey = Some("o2"), limit = Some(25))
        else QueryOpts(reduce = false, startKey = Some("o5"),
          endKey = Some("o6"))).collect().map(_.toString).toSeq
      assert(adOut.filter(col("q") === i).drop("q").collect()
        .map(_.toString).toSeq == want && want.nonEmpty,
        s"allDocs queries batch $i mismatch")
    }
  }

  test("attachment replication: known digests stub, unknown ship, stubs resolve or error") {
    import spark.implicits._
    import graft.view.Attachments
    val docs = Attachments.put(
      Seq(("a", "same"), ("b", "changed"), ("c", "new"))
        .toDF("id", "txt"),
      "f", encode($"txt", "UTF-8"), "text/plain")
    // target already holds a's payload; claims (but lost) b's OLD rev
    val tgtDigests = Seq("same", "old-b").toDF("t")
      .select(concat(lit("md5-"), md5(encode($"t", "UTF-8"))).as("digest"))
    val plan = Attachments.replicationAttachments(docs, col("id"),
      tgtDigests)
    val p = plan.orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Boolean]("stub"),
        r.getAs[Array[Byte]]("data") != null))
    assert(p.toSeq == Seq(
      ("a", true, false),   // known digest: stub, no bytes
      ("b", false, true),   // changed payload: full transfer
      ("c", false, true)))  // new: full transfer
    val store = Seq("same").toDF("t")
      .select(concat(lit("md5-"), md5(encode($"t", "UTF-8"))).as("digest"),
        encode($"t", "UTF-8").as("data"))
    val applied = Attachments.applyTransfer(plan, store)
    val a = applied.orderBy("id").collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("status"),
        Option(r.getAs[Array[Byte]]("data")).map(new String(_, "UTF-8"))))
    assert(a.toSeq == Seq(
      ("a", "ok", Some("same")),      // stub resolved from the store
      ("b", "ok", Some("changed")),   // shipped bytes inserted
      ("c", "ok", Some("new"))))
    // a stub whose digest the store lacks is an explicit error
    val broken = Attachments.applyTransfer(plan,
      store.filter(lit(false)))
    assert(broken.filter(col("status") === "missing_stub").count() == 1)
  }

  test("queryKeysReport: request order, repeats, explicit not_found rows") {
    import spark.implicits._
    val docs = Seq("a", "b", "c").toDF("id")
    val v = View.allDocs(docs, col("id"))
    val got = v.queryKeysReport(Seq("b", "zz", "a", "b")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).orNull, r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, "b", "b", null),
      (2L, "zz", null, "not_found"),
      (3L, "a", "a", null),
      (4L, "b", "b", null)),
      s"got ${got.toSeq}")
  }

  test("namespace docs: _all_docs excludes _local/, endpoints scope their prefix") {
    import spark.implicits._
    val docs = Seq("doc1", "doc2", "_design/d1", "_design/d2",
      "_local/ckpt", "zzz").toDF("id")
    def ids(v: View): Seq[String] =
      v.queryResult(QueryOpts(reduce = false)).rows
        .select(col("id").cast("string")).collect().map(_.getString(0)).toSeq
    assert(ids(View.allDocs(docs, col("id"))) ==
      Seq("_design/d1", "_design/d2", "doc1", "doc2", "zzz"),
      "_all_docs must list design docs but never _local/ docs")
    assert(ids(View.designDocs(docs, col("id"))) ==
      Seq("_design/d1", "_design/d2"))
    assert(ids(View.localDocs(docs, col("id"))) == Seq("_local/ckpt"))
    // the namespace restriction composes with the QueryOpts envelope
    val page = View.designDocs(docs, col("id"))
      .queryResult(QueryOpts(reduce = false, limit = Some(1),
        descending = true))
    assert(page.rows.select(col("id").cast("string"))
      .collect().map(_.getString(0)).toSeq == Seq("_design/d2"))
  }
}
