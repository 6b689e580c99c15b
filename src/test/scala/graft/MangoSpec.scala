package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Mango

class MangoSpec extends SparkSpecBase {

  private def orders: DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")

  test("selector compiles to one predicate and matches the SQL equivalent") {
    val sel = """{"$and": [
      {"o_orderstatus": {"$in": ["O", "F"]}},
      {"o_totalprice": {"$gte": 50000, "$lt": 200000}},
      {"o_orderpriority": {"$regex": "^[13]-"}}]}"""
    val got = orders.filter(Mango.compile(Mango.parseSelector(sel),
      orders.schema)).count()
    val want = orders.filter(
      col("o_orderstatus").isin("O", "F") &&
      col("o_totalprice") >= 50000 && col("o_totalprice") < 200000 &&
      col("o_orderpriority").rlike("^[13]-")).count()
    assert(got == want && got > 0)
  }

  test("implicit $eq, $ne (exists-and-differs), $exists, $nor") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), Some(5L)), (2L, Some("b"), None),
      (3L, None, Some(7L))).toDF("id", "s", "n")
    def ids(sel: String): Set[Long] =
      df.filter(Mango.compile(Mango.parseSelector(sel), df.schema))
        .select("id").as[Long].collect().toSet
    assert(ids("""{"s": "a"}""") == Set(1L))
    // $ne only matches docs that HAVE the field with a different value
    assert(ids("""{"s": {"$ne": "a"}}""") == Set(2L))
    assert(ids("""{"n": {"$exists": true}}""") == Set(1L, 3L))
    assert(ids("""{"n": {"$exists": false}}""") == Set(2L))
    // a condition on a missing field matches nothing; $exists:false matches
    assert(ids("""{"zzz": {"$gt": 0}}""") == Set())
    assert(ids("""{"zzz": {"$exists": false}}""") == Set(1L, 2L, 3L))
    assert(ids("""{"$nor": [{"s": "a"}, {"n": 7}]}""") == Set(2L))
    assert(ids("""{"n": {"$mod": [2, 1]}}""") == Set(1L, 3L))
    assert(ids("""{"s": {"$type": "string"}}""") == Set(1L, 2L))
    assert(ids("""{"s": {"$type": "number"}}""") == Set())
  }

  test("empty-list operators: $in [] matches nothing, $nin [] everything-with-field, empty combinators") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "s")
    def ids(sel: String): Set[Long] =
      df.filter(Mango.compile(Mango.parseSelector(sel), df.schema))
        .select("id").as[Long].collect().toSet
    assert(ids("""{"s": {"$in": []}}""") == Set())
    assert(ids("""{"s": {"$nin": []}}""") == Set(1L))
    assert(ids("""{"$or": []}""") == Set())
    assert(ids("""{"$nor": []}""") == Set(1L, 2L))
    assert(ids("""{"$and": []}""") == Set(1L, 2L))
    val arr = Seq((1L, Seq(1, 2)), (2L, Seq[Int]())).toDF("id", "xs")
    val all0 = arr.filter(Mango.compile(
      Mango.parseSelector("""{"xs": {"$all": []}}"""), arr.schema))
      .select("id").as[Long].collect().toSet
    assert(all0 == Set(1L, 2L))
  }

  test("$elemMatch/$allMatch/$size/$all over array columns") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 5, 9)), (2L, Seq(2, 4)), (3L, Seq[Int]()))
      .toDF("id", "xs")
    def ids(sel: String): Set[Long] =
      df.filter(Mango.compile(Mango.parseSelector(sel), df.schema))
        .select("id").as[Long].collect().toSet
    assert(ids("""{"xs": {"$elemMatch": {"$gt": 8}}}""") == Set(1L))
    assert(ids("""{"xs": {"$allMatch": {"$lt": 5}}}""") == Set(2L, 3L))
    assert(ids("""{"xs": {"$size": 2}}""") == Set(2L))
    assert(ids("""{"xs": {"$all": [1, 9]}}""") == Set(1L))
  }

  test("find: sort + fields + limit/skip, deterministic id tiebreak") {
    val req = """{
      "selector": {"o_orderstatus": "F"},
      "fields": ["o_orderkey", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}],
      "limit": 10, "skip": 3}"""
    val got = Mango.find(orders, "o_orderkey", req).collect()
    val want = orders.filter(col("o_orderstatus") === "F")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_totalprice")
      .collect().slice(3, 13)
    assert(got.toSeq == want.toSeq)
  }

  test("indexed find equals full-scan find, and prunes index buckets") {
    val dir = java.nio.file.Files.createTempDirectory("mango-idx").toString
    val idx = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderstatus", "o_orderdate"), s"$dir/idx", numBuckets = 8)
    val req = """{
      "selector": {
        "o_orderstatus": "F",
        "o_orderdate": {"$gte": "1996-01-01T00:00:00Z",
                         "$lt": "1997-01-01T00:00:00Z"},
        "o_totalprice": {"$gt": 10000}},
      "fields": ["o_orderkey", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}],
      "limit": 500}"""
    val viaIndex = Mango.findIndexed(spark, orders, "o_orderkey", idx, req)
    val viaScan = Mango.find(orders, "o_orderkey", req)
    assert(viaIndex.collect().toSeq == viaScan.collect().toSeq)
    assert(viaIndex.count() > 0)
    // the candidate read prunes index bucket directories: the index scan
    // carries a PartitionFilters entry on _kb (the startkey/endkey range)
    val plan = viaIndex.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_kb"),
      s"no _kb partition pruning in:\n$plan")
    // the reopened index serves the same plan
    val reopened = Mango.openIndex(spark, s"$dir/idx")
    assert(reopened.fields == Seq("o_orderstatus", "o_orderdate"))
  }

  test("covered find serves from the index alone (no documents scan)") {
    val dir = java.nio.file.Files.createTempDirectory("mango-cov").toString
    val idx = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderstatus", "o_totalprice"), s"$dir/idx", numBuckets = 4)
    // selector, sort and fields all within {indexed fields, id}
    val req = """{
      "selector": {"o_orderstatus": "F",
                    "o_totalprice": {"$gte": 50000, "$lt": 150000}},
      "fields": ["o_orderkey", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}],
      "limit": 40}"""
    val covered = Mango.findIndexed(spark, orders, "o_orderkey", idx, req)
    val viaScan = Mango.find(orders, "o_orderkey", req)
    assert(covered.collect().toSeq == viaScan.collect().toSeq)
    assert(covered.count() > 0)
    val scans = covered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty &&
      scans.forall(_.metadata("Location").contains(s"$dir/idx")),
      "covered find must read ONLY the index")

    // a request touching a non-indexed field takes the fetch path and
    // still agrees
    val req2 = """{
      "selector": {"o_orderstatus": "F",
                    "o_totalprice": {"$gte": 50000},
                    "o_orderpriority": {"$regex": "^1-"}},
      "fields": ["o_orderkey"], "sort": ["o_orderkey"], "limit": 20}"""
    assert(Mango.findIndexed(spark, orders, "o_orderkey", idx, req2)
      .collect().toSeq ==
      Mango.find(orders, "o_orderkey", req2).collect().toSeq)
  }

  test("pickIndex prefers the tightest usable prefix; findAuto agrees") {
    val dir = java.nio.file.Files.createTempDirectory("mango-pick").toString
    val byStatus = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderstatus", "o_orderdate"), s"$dir/a", numBuckets = 4)
    val byPrio = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderpriority"), s"$dir/b", numBuckets = 4)
    val sel = Mango.parseSelector(
      """{"o_orderstatus": "F",
         "o_orderdate": {"$gte": "1996-01-01T00:00:00Z"}}""")
    assert(Mango.pickIndex(sel, Seq(byPrio, byStatus), orders.schema)
      .contains(byStatus))
    val selPrio = Mango.parseSelector("""{"o_orderpriority": "1-URGENT"}""")
    assert(Mango.pickIndex(selPrio, Seq(byPrio, byStatus), orders.schema)
      .contains(byPrio))
    // no index usable -> None, findAuto falls back to scan
    val selNone = Mango.parseSelector("""{"o_totalprice": {"$gt": 1}}""")
    assert(Mango.pickIndex(selNone, Seq(byPrio, byStatus),
      orders.schema).isEmpty)
    val req = """{"selector": {"o_orderstatus": "F",
        "o_orderdate": {"$gte": "1996-01-01T00:00:00Z",
                         "$lt": "1996-07-01T00:00:00Z"}},
      "fields": ["o_orderkey"], "sort": ["o_orderkey"], "limit": 30}"""
    assert(Mango.findAuto(spark, orders, "o_orderkey",
      Seq(byPrio, byStatus), req).collect().toSeq ==
      Mango.find(orders, "o_orderkey", req).collect().toSeq)
  }

  test("indexBounds: eq prefix + range close; unusable without first field") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("a", "b", "c", "z")
      .map(StructField(_, LongType)))
    val sel = Mango.parseSelector(
      """{"a": 1, "b": {"$gte": 10, "$lt": 20}, "c": {"$gt": 0}}""")
    val Some((start, end, incl)) =
      Mango.indexBounds(sel, Seq("a", "b", "c"), schema)
    assert(start == Seq(1L, 10L))
    assert(end == Seq(1L, 20L) && !incl)
    // index whose first field is unconstrained cannot serve
    assert(Mango.indexBounds(sel, Seq("z", "a"), schema).isEmpty)
    // pure equality on every field: exact prefix bounds
    val eq = Mango.parseSelector("""{"a": 1}""")
    val Some((s2, e2, _)) = Mango.indexBounds(eq, Seq("a"), schema)
    assert(s2 == Seq(1L) && e2 == Seq(1L, graft.view.MaxKey))
  }

  test("partial index: implied queries serve from it, others fall back") {
    val dir = java.nio.file.Files.createTempDirectory("mango-part").toString
    val partial = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_totalprice"), s"$dir/pidx", numBuckets = 4,
      partialFilter = Some("""{"o_orderstatus": "F"}"""))
    // the partial index holds only the F orders
    val idxRows = spark.read.parquet(s"$dir/pidx/data").count()
    val fCount = orders.filter(col("o_orderstatus") === "F").count()
    assert(idxRows == fCount && fCount < orders.count())

    val implied = """{
      "selector": {"o_orderstatus": "F",
                    "o_totalprice": {"$gte": 50000}},
      "fields": ["o_orderkey", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}], "limit": 100}"""
    val viaIdx = Mango.findIndexed(spark, orders, "o_orderkey",
      partial, implied)
    assert(viaIdx.collect().toSeq ==
      Mango.find(orders, "o_orderkey", implied).collect().toSeq)
    assert(viaIdx.count() > 0)

    // a query NOT implying the filter must not read the partial index
    val notImplied = """{
      "selector": {"o_totalprice": {"$gte": 50000}},
      "fields": ["o_orderkey", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}], "limit": 100}"""
    val fallback = Mango.findIndexed(spark, orders, "o_orderkey",
      partial, notImplied)
    assert(fallback.collect().toSeq ==
      Mango.find(orders, "o_orderkey", notImplied).collect().toSeq)
    val scans = fallback.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty &&
      scans.forall(!_.metadata("Location").contains("pidx")),
      "non-implied query must not touch the partial index")

    // pickIndex: eligible partial outranks the full index; ineligible
    // selectors skip it
    val full = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_totalprice"), s"$dir/fidx", numBuckets = 4)
    val selImplied = Mango.parseSelector(
      """{"o_orderstatus": "F", "o_totalprice": {"$gte": 50000}}""")
    val selPlain = Mango.parseSelector(
      """{"o_totalprice": {"$gte": 50000}}""")
    assert(Mango.pickIndex(selImplied, Seq(full, partial), orders.schema)
      .contains(partial))
    assert(Mango.pickIndex(selPlain, Seq(full, partial), orders.schema)
      .contains(full))
    // reopening restores the partial stamp
    assert(Mango.openIndex(spark, s"$dir/pidx").partial ==
      Some("""{"o_orderstatus": "F"}"""))
  }

  test("$keyMapMatch: some key of a map field satisfies the condition") {
    import spark.implicits._
    val df = Seq(
      (1L, Map("alpha" -> 1, "beta" -> 2)),
      (2L, Map("gamma" -> 3)),
      (3L, Map.empty[String, Int]))
      .toDF("id", "m")
    def ids(sel: String): Set[Long] =
      df.filter(Mango.compile(Mango.parseSelector(sel), df.schema))
        .select("id").as[Long].collect().toSet
    assert(ids("""{"m": {"$keyMapMatch": {"$eq": "beta"}}}""") == Set(1L))
    assert(ids("""{"m": {"$keyMapMatch": {"$regex": "^g"}}}""") == Set(2L))
    // no key matches / empty map / missing field: no match
    assert(ids("""{"m": {"$keyMapMatch": {"$eq": "zzz"}}}""") == Set())
    assert(ids("""{"zzz": {"$keyMapMatch": {"$eq": "a"}}}""") == Set())
    // composes with other conditions
    assert(ids(
      """{"m": {"$keyMapMatch": {"$regex": "a"}}, "id": {"$gt": 1}}""")
      == Set(2L))
    // inner combinators apply per-key
    assert(ids(
      """{"m": {"$keyMapMatch": {"$and": [{"$gte": "a"}, {"$lt": "b"}]}}}""")
      == Set(1L))
  }

  test("$beginsWith: string prefix; closes an index range; indexed == scan") {
    import spark.implicits._
    val df = Seq((1L, Some("apple")), (2L, Some("applesauce")),
      (3L, Some("banana")), (4L, None: Option[String]), (5L, Some("app")))
      .toDF("id", "s")
    def ids(sel: String): Set[Long] =
      df.filter(Mango.compile(Mango.parseSelector(sel), df.schema))
        .select("id").as[Long].collect().toSet
    assert(ids("""{"s": {"$beginsWith": "app"}}""") == Set(1L, 2L, 5L))
    assert(ids("""{"s": {"$beginsWith": "apple"}}""") == Set(1L, 2L))
    assert(ids("""{"s": {"$beginsWith": ""}}""") == Set(1L, 2L, 3L, 5L),
      "empty prefix matches every string-valued doc")
    // non-string fields and missing fields match nothing
    assert(ids("""{"id": {"$beginsWith": "1"}}""") == Set())
    assert(ids("""{"zzz": {"$beginsWith": "a"}}""") == Set())
    // the prefix CLOSES an index range: bounds defined, and an
    // index-served find equals the scan find
    val sel = """{"o_orderpriority": {"$beginsWith": "1-"},
                  "o_totalprice": {"$gte": 50000}}"""
    assert(Mango.indexBounds(Mango.parseSelector(sel),
      Seq("o_orderpriority"), orders.schema).isDefined,
      "$beginsWith must close the index prefix")
    val dir = java.nio.file.Files.createTempDirectory("graft-mango-bw")
      .toString
    val idx = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderpriority"), s"$dir/idx", numBuckets = 4)
    val req = s"""{
      "selector": $sel,
      "fields": ["o_orderkey", "o_orderpriority"],
      "sort": ["o_orderkey"], "limit": 300}"""
    val viaIndex = Mango.findIndexed(spark, orders, "o_orderkey", idx, req)
    val viaScan = Mango.find(orders, "o_orderkey", req)
    assert(viaIndex.collect().toSeq == viaScan.collect().toSeq)
    assert(viaIndex.count() > 0)
  }

  test("findPage: bookmark pages concatenate to the unpaged find exactly") {
    val paged = """{"selector": {"o_totalprice": {"$gte": 400000}},
      "fields": ["o_orderkey", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}], "limit": 37}"""
    var bm: Option[String] = None
    var pages = Vector.empty[Seq[Row]]
    var done = false
    while (!done) {
      val (p, nb) = Mango.findPage(orders, "o_orderkey", paged, bm)
      pages :+= p.collect().toSeq
      bm = nb
      done = nb.isEmpty
    }
    val flat = pages.flatten
    val unpaged = Mango.find(orders, "o_orderkey",
      paged.replace("\"limit\": 37", "\"limit\": 1000000"))
      .collect().toSeq
    assert(flat == unpaged, "pages must concatenate to the full result")
    assert(pages.size > 2, s"want several pages, got ${pages.size}")
    // every page except possibly the last is exactly full; no dups
    assert(pages.init.forall(_.size == 37))
    assert(flat.map(_.getLong(0)).distinct.size == flat.size)
    // skip applies to the FIRST page only (CouchDB semantics)
    val (skipped, _) = Mango.findPage(orders, "o_orderkey",
      paged.replace("\"limit\": 37", "\"limit\": 37, \"skip\": 5"), None)
    assert(skipped.collect().toSeq == flat.slice(5, 42))
  }

  /** Wait for async listener-bus delivery to drain: poll until the
    * counter is unchanged across two consecutive reads. */
  private def settle(c: java.util.concurrent.atomic.AtomicInteger): Int = {
    var prev = -1
    var cur = c.get()
    var spins = 0
    while (cur != prev && spins < 40) {
      Thread.sleep(150); prev = cur; cur = c.get(); spins += 1
    }
    cur
  }

  test("findPage executes ONE job per page (limit+1 collect, local page)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val req = """{"selector": {"o_totalprice": {"$gte": 400000}},
        "fields": ["o_orderkey", "o_totalprice"],
        "sort": [{"o_totalprice": "desc"}], "limit": 37}"""
      val (p1, bm1) = Mango.findPage(orders, "o_orderkey", req, None)
      val n1 = p1.collect().length // consuming the page is free (local)
      val afterFirst = settle(counter)
      assert(afterFirst <= 2,
        s"one findPage call + consumption must be <=2 jobs, was $afterFirst")
      assert(n1 == 37 && bm1.isDefined)
      // the resumed page costs the same
      Mango.findPage(orders, "o_orderkey", req, bm1)._1.collect()
      assert(settle(counter) - afterFirst <= 2)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bookmarks are typed JSON: round-trip every cursor type, reject junk") {
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("1996-03-04T05:06:07.123456Z"))
    val vals = Seq("s", true, 42L, 7, 3.5d, 1.25f,
      new java.math.BigDecimal("123.4500"), ts,
      java.sql.Date.valueOf("1995-07-16"), null)
    val rt = Mango.decodeBookmark(Mango.encodeBookmark(vals))
    assert(rt == vals, s"round-trip mismatch: $rt")
    // micros grain survives (the collation/encoding grain)
    assert(rt(7).asInstanceOf[java.sql.Timestamp].getNanos == 123456000)
    // TIMESTAMP_NTZ cursors (LocalDateTime — what a timestamp_ntz
    // column's rows carry), Instant and LocalDate round-trip too
    val ntz = java.time.LocalDateTime.parse("1996-03-04T05:06:07.123456")
    assert(Mango.decodeBookmark(Mango.encodeBookmark(Seq(ntz))) == Seq(ntz))
    val inst = java.time.Instant.parse("1996-03-04T05:06:07.123456Z")
    assert(Mango.decodeBookmark(Mango.encodeBookmark(Seq(inst))) ==
      Seq(java.sql.Timestamp.from(inst)))
    val ld = java.time.LocalDate.parse("1995-07-16")
    assert(Mango.decodeBookmark(Mango.encodeBookmark(Seq(ld))) ==
      Seq(java.sql.Date.valueOf("1995-07-16")))
    // junk and LEGACY Java-serialized bookmarks are rejected loudly,
    // never fed to object deserialization
    def rejects(b: String): Unit = {
      val e = intercept[IllegalArgumentException](Mango.decodeBookmark(b))
      assert(e.getMessage.contains("unrecognized mango bookmark"))
    }
    rejects("!!!not-base64!!!")
    rejects(java.util.Base64.getUrlEncoder.encodeToString(
      "plain text".getBytes("UTF-8")))
    rejects(java.util.Base64.getUrlEncoder.encodeToString(
      """{"t":"s"}""".getBytes("UTF-8"))) // object, not array
    val legacy = { // what the pre-JSON format produced
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(Array[Any]("x", 1L)); oos.close()
      java.util.Base64.getUrlEncoder.encodeToString(bos.toByteArray)
    }
    rejects(legacy)
  }

  test("findPageIndexed: index-served pages == scan pages; _kb pruned on EVERY page") {
    val dir = java.nio.file.Files.createTempDirectory("mango-pgidx").toString
    val idx = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_totalprice"), s"$dir/idx", numBuckets = 8)
    // fetch path: the regex residual touches a non-indexed field
    val req = """{"selector": {"o_totalprice": {"$gte": 250000},
      "o_orderpriority": {"$regex": "^[12]-"}},
      "fields": ["o_orderkey", "o_orderpriority", "o_totalprice"],
      "sort": ["o_totalprice"], "limit": 50}"""
    def walk(f: Option[String] => (org.apache.spark.sql.DataFrame,
        Option[String])): (Seq[Row], Seq[String]) = {
      var bm: Option[String] = None
      var acc = Vector.empty[Row]
      var bms = Vector.empty[String]
      var done = false
      while (!done) {
        val (p, nb) = f(bm)
        acc ++= p.collect()
        bm = nb; done = nb.isEmpty
        nb.foreach(bms :+= _)
      }
      (acc, bms)
    }
    val (viaIndex, _) = walk(bm =>
      Mango.findPageIndexed(spark, orders, "o_orderkey", idx, req, bm))
    val (viaScan, scanBms) = walk(bm =>
      Mango.findPage(orders, "o_orderkey", req, bm))
    assert(viaIndex == viaScan && viaIndex.size > 100,
      s"indexed pages must equal scan pages (${viaIndex.size} rows)")
    // cursor bookmarks are interchangeable between the two paths
    val bmScan = scanBms.head
    val (pX, _) = Mango.findPageIndexed(spark, orders, "o_orderkey", idx,
      req, Some(bmScan))
    assert(pX.collect().toSeq == viaScan.slice(50, 100))
    // EVERY page's fetch plan prunes _kb — including resumed ones,
    // where the cursor adds a lower bucket bound: the deepest page's
    // plan must carry a STRICTLY HIGHER _kb lower bound than page 1's
    // (deep pages skip the below-cursor bucket directories entirely)
    val kbRe = """\(_kb#\d+ >= (\d+)\)""".r
    def kbLower(bm: Option[String]): Int = {
      val Some((fetch, _, _, _)) =
        Mango.pagePlanIndexed(spark, orders, "o_orderkey", idx, req, bm)
      val plan = fetch.limit(51).queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters") && plan.contains("_kb"),
        s"no _kb partition pruning in page plan:\n$plan")
      kbRe.findAllMatchIn(plan).map(_.group(1).toInt).max
    }
    val loFirst = kbLower(None)
    val loDeep = kbLower(Some(scanBms.last))
    assert(loDeep > loFirst && loFirst >= 0,
      s"deep page must prune more buckets than page 1 " +
        s"(page1 _kb >= $loFirst, deep _kb >= $loDeep)")
    // a sort the index CANNOT serve (different field list) falls back
    // to scan paging (still correct); single-direction descending now
    // rides the index — its own spec below
    val reqOther = req.replace("\"sort\": [\"o_totalprice\"]",
      "\"sort\": [\"o_orderpriority\"]")
    assert(Mango.pagePlanIndexed(spark, orders, "o_orderkey", idx,
      reqOther, None).isEmpty)
    val (viaAuto, _) = walk(bm => Mango.findPageAuto(spark, orders,
      "o_orderkey", Seq(idx), reqOther, bm))
    val (viaScanOther, _) = walk(bm =>
      Mango.findPage(orders, "o_orderkey", reqOther, bm))
    assert(viaAuto == viaScanOther && viaAuto.nonEmpty)
  }

  test("descending index paging: newest-first pages ride the same index, pruned deeper each page") {
    val dir = java.nio.file.Files.createTempDirectory("mango-pgdesc").toString
    val idx = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_totalprice"), s"$dir/idx", numBuckets = 8)
    val req = """{"selector": {"o_totalprice": {"$gte": 250000},
      "o_orderpriority": {"$regex": "^[12]-"}},
      "fields": ["o_orderkey", "o_orderpriority", "o_totalprice"],
      "sort": [{"o_totalprice": "desc"}], "limit": 50}"""
    def walk(f: Option[String] => (org.apache.spark.sql.DataFrame,
        Option[String])): (Seq[Row], Seq[String]) = {
      var bm: Option[String] = None
      var acc = Vector.empty[Row]
      var bms = Vector.empty[String]
      var done = false
      while (!done) {
        val (p, nb) = f(bm)
        acc ++= p.collect()
        bm = nb; done = nb.isEmpty
        nb.foreach(bms :+= _)
      }
      (acc, bms)
    }
    val (viaIndex, idxBms) = walk(bm =>
      Mango.findPageIndexed(spark, orders, "o_orderkey", idx, req, bm))
    val (viaScan, scanBms) = walk(bm =>
      Mango.findPage(orders, "o_orderkey", req, bm))
    assert(viaIndex == viaScan && viaIndex.size > 100,
      s"desc indexed pages must equal scan pages (${viaIndex.size} rows)")
    // pages concatenate to the unpaged descending find exactly
    val unpaged = Mango.find(orders, "o_orderkey",
      req.replace("\"limit\": 50", "\"limit\": 1000000")).collect().toSeq
    assert(viaIndex == unpaged)
    // the desc request IS index-pageable (no scan fallback)
    assert(Mango.pagePlanIndexed(spark, orders, "o_orderkey", idx, req,
      None).isDefined)
    // bookmarks stay interchangeable with the scan pager
    val (pX, _) = Mango.findPageIndexed(spark, orders, "o_orderkey", idx,
      req, Some(scanBms.head))
    assert(pX.collect().toSeq == viaScan.slice(50, 100))
    // every page prunes _kb; a deep desc page's cursor TIGHTENS the
    // upper bucket bound (the walk descends, so served buckets drop off
    // the top of the index read)
    val kbRe = """\(_kb#\d+ <= (\d+)\)""".r
    def kbUpper(bm: Option[String]): Int = {
      val Some((fetch, _, _, _)) =
        Mango.pagePlanIndexed(spark, orders, "o_orderkey", idx, req, bm)
      val plan = fetch.limit(51).queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters") && plan.contains("_kb"),
        s"no _kb partition pruning in desc page plan:\n$plan")
      kbRe.findAllMatchIn(plan).map(_.group(1).toInt).min
    }
    val upFirst = kbUpper(None)
    val upDeep = kbUpper(Some(idxBms.last))
    assert(upDeep < upFirst,
      s"deep desc page must prune buckets above the cursor " +
        s"(page1 _kb <= $upFirst, deep _kb <= $upDeep)")
  }

  test("$text served from a Mango text index == relational conjunctive match") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("mango-text").toString
    val tix = Mango.createTextIndex(spark, docs, "doc_id", "text",
      s"$dir/tix", nBuckets = 16)
    val req = """{"selector": {"$text": "merge filter",
      "source": {"$in": ["src0", "src1"]}},
      "fields": ["doc_id", "source"], "sort": ["doc_id"], "limit": 100000}"""
    val got = Mango.findText(spark, docs, "doc_id", tix, req).collect().toSeq
    val want = docs
      .filter(array_contains(split(col("text"), "\\s+"), "merge") &&
        array_contains(split(col("text"), "\\s+"), "filter") &&
        col("source").isin("src0", "src1"))
      .select("doc_id", "source").orderBy("doc_id").collect().toSeq
    assert(got == want && got.nonEmpty, s"${got.size} vs ${want.size}")
    // findAuto routes $text to the text index; reopening restores field
    assert(Mango.findAuto(spark, docs, "doc_id", Nil, Seq(tix), req)
      .collect().toSeq == want)
    assert(Mango.openTextIndex(spark, s"$dir/tix") == tix)
    // the index's stamped analyzer governs query terms: a stopworded
    // index drops stopword query terms instead of emptying the match
    val stopIx = Mango.createTextIndex(spark, docs, "doc_id", "text",
      s"$dir/stopix", nBuckets = 16,
      analyzer = graft.operators.TextSearch.Analyzer(
        stopwords = Seq("the", "a")))
    val req2 = """{"selector": {"$text": "the merge filter"},
      "fields": ["doc_id"], "sort": ["doc_id"], "limit": 100000}"""
    val got2 = Mango.findText(spark, docs, "doc_id", stopIx, req2)
      .collect().toSeq
    val want2 = docs
      .filter(array_contains(split(col("text"), "\\s+"), "merge") &&
        array_contains(split(col("text"), "\\s+"), "filter"))
      .select("doc_id").orderBy("doc_id").collect().toSeq
    assert(got2 == want2 && got2.nonEmpty)
    // $text without a text index is an error (CouchDB semantics) —
    // both on the scan path and in findAuto
    intercept[IllegalArgumentException](
      Mango.find(docs, "doc_id", req).collect())
    intercept[IllegalArgumentException](
      Mango.findAuto(spark, docs, "doc_id", Nil, Nil, req))
    // $text below the top-level conjunction has no servable plan
    intercept[IllegalArgumentException](
      Mango.findText(spark, docs, "doc_id", tix,
        """{"selector": {"$or": [{"$text": "merge"}, {"doc_id": 1}]},
           "fields": ["doc_id"]}"""))
  }

  test("TextQuery: the Lucene grammar parses exactly, rejects loudly") {
    import graft.operators.TextQuery
    import graft.operators.TextQuery._
    // bare adjacency = AND; OR binds looser
    assert(parse("quick fox") == TAnd(Seq(TTerm(None, "quick"),
      TTerm(None, "fox"))))
    assert(parse("a OR b c") == TOr(Seq(TTerm(None, "a"),
      TAnd(Seq(TTerm(None, "b"), TTerm(None, "c"))))))
    assert(parse("(a OR b) AND NOT c") == TAnd(Seq(
      TOr(Seq(TTerm(None, "a"), TTerm(None, "b"))),
      TNot(TTerm(None, "c")))))
    assert(parse("title:war") == TTerm(Some("title"), "war"))
    assert(parse("\"quick brown fox\"") ==
      TPhrase(None, Seq("quick", "brown", "fox")))
    assert(parse("title:\"ad hoc\"") ==
      TPhrase(Some("title"), Seq("ad", "hoc")))
    // one-token phrase degrades to a term
    assert(parse("\"solo\"") == TTerm(None, "solo"))
    // ranges: [] inclusive, {} exclusive, mixed per side, TO any case
    assert(parse("price:[10 TO 20]") ==
      TRange("price", "10", "20", loInc = true, hiInc = true))
    assert(parse("price:{10 to 20}") ==
      TRange("price", "10", "20", loInc = false, hiInc = false))
    assert(parse("price:{10 TO 20]") ==
      TRange("price", "10", "20", loInc = false, hiInc = true))
    // field-scoped group distributes the field
    assert(parse("title:(a OR \"b c\")") == TOr(Seq(
      TTerm(Some("title"), "a"), TPhrase(Some("title"), Seq("b", "c")))))
    // && / || aliases
    assert(parse("a && b || c") == TOr(Seq(
      TAnd(Seq(TTerm(None, "a"), TTerm(None, "b"))), TTerm(None, "c"))))
    // routing test: plain strings stay on the exact conjunctive path
    assert(!TextQuery.isLucene("merge filter"))
    assert(TextQuery.isLucene("source:src2"))
    assert(TextQuery.isLucene("a OR b"))
    assert(TextQuery.isLucene("\"a b\""))
    // loud rejections, never a partial parse
    intercept[IllegalArgumentException](parse("[1 TO 2]")) // no field
    intercept[IllegalArgumentException](parse("\"unterminated"))
    intercept[IllegalArgumentException](parse("(a OR b")) // missing )
    intercept[IllegalArgumentException](parse("a OR")) // dangling OR
    intercept[IllegalArgumentException](parse("f:(g:x)")) // nested field
    intercept[IllegalArgumentException](parse("price:[10 TO]"))
    intercept[IllegalArgumentException](parse(""))
  }

  test("Lucene $text: fielded terms, phrases, OR/NOT, ranges serve exactly; unservable rejected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "quick brown fox", "news", 10L),
      (2L, "brown bear quick", "blog", 20L),
      (3L, "lazy dog", "news", 30L),
      (4L, "quick quick brown", "wiki", 15L),
      (5L, "fox brown quick", "blog", 25L))
      .toDF("doc_id", "text", "source", "n")
    val dir = java.nio.file.Files.createTempDirectory("mango-luc").toString
    val tix = Mango.createTextIndex(spark, docs, "doc_id",
      Seq("text", "source"), s"$dir/tix", 16,
      graft.operators.TextSearch.Analyzer())
    def ids(q: String, extra: String = ""): Set[Long] =
      Mango.findText(spark, docs, "doc_id", tix,
        s"""{"selector": {"$$text": "$q"$extra},
           | "fields": ["doc_id"], "sort": ["doc_id"],
           | "limit": 1000}""".stripMargin)
        .as[Long].collect().toSet
    // default-field phrase: contiguous, in order
    assert(ids("\\\"quick brown\\\"") == Set(1L, 4L))
    // doc 2 ("brown bear quick") is NOT contiguous — positions matter
    assert(ids("\\\"brown quick\\\"") == Set(5L))
    // fielded term: must be in THAT field, probe stays a superset
    assert(ids("source:news") == Set(1L, 3L))
    // docs whose TEXT says news but source doesn't would be probed
    // then residual-rejected — covered by construction above
    // OR / NOT / grouping
    assert(ids("fox OR bear") == Set(1L, 2L, 5L))
    assert(ids("quick AND NOT fox") == Set(2L, 4L))
    assert(ids("(fox OR bear) AND source:blog") == Set(2L, 5L))
    // fielded phrase
    assert(ids("text:\\\"brown bear\\\"") == Set(2L))
    // range rides along a probed conjunct
    assert(ids("quick AND n:[15 TO 25]") == Set(2L, 4L, 5L))
    assert(ids("quick AND n:{15 TO 25]") == Set(2L, 5L))
    // non-text Mango residual composes
    assert(ids("quick", ", \"source\": \"blog\"") == Set(2L, 5L))
    // bookmark paging over a Lucene query == the unpaged find
    val unpaged = Mango.findText(spark, docs, "doc_id", tix,
      """{"selector": {"$text": "quick OR fox"},
        | "fields": ["doc_id"], "sort": ["doc_id"],
        | "limit": 1000}""".stripMargin).as[Long].collect().toSeq
    var bm: Option[String] = None
    var pages = Seq.empty[Long]
    var more = true
    while (more) {
      val (page, next) = Mango.findTextPage(spark, docs, "doc_id", tix,
        """{"selector": {"$text": "quick OR fox"},
          | "fields": ["doc_id"], "sort": ["doc_id"],
          | "limit": 2}""".stripMargin, bm)
      pages = pages ++ page.as[Long].collect().toSeq
      bm = next; more = next.isDefined
    }
    assert(pages == unpaged && unpaged.nonEmpty)
    // UNSERVABLE shapes are rejected loudly, never scanned:
    // pure NOT, pure range, OR with an un-probed branch
    intercept[IllegalArgumentException](ids("NOT fox"))
    intercept[IllegalArgumentException](ids("n:[10 TO 20]"))
    intercept[IllegalArgumentException](ids("fox OR n:[10 TO 20]"))
    // a term in an UNSTAMPED field cannot be served from the postings
    intercept[IllegalArgumentException](ids("lang:en AND fox"))
    // a range field must exist in the doc schema
    intercept[IllegalArgumentException](ids("quick AND zzz:[1 TO 2]"))
    // stopword terms DROP from the analyzed query (fox AND the = fox),
    // and an all-stopword query is an error
    val stopIx = Mango.createTextIndex(spark, docs, "doc_id",
      Seq("text", "source"), s"$dir/stopix", 16,
      graft.operators.TextSearch.Analyzer(stopwords = Seq("the")))
    def sids(q: String): Set[Long] =
      Mango.findText(spark, docs, "doc_id", stopIx,
        s"""{"selector": {"$$text": "$q"},
           | "fields": ["doc_id"], "sort": ["doc_id"],
           | "limit": 1000}""".stripMargin).as[Long].collect().toSet
    assert(sids("fox AND the") == sids("fox OR the"))
    assert(sids("fox AND the") == Set(1L, 5L))
    intercept[IllegalArgumentException](sids("the AND the"))
    // a phrase containing a stopword matches nothing (positional
    // postings never hold the stopword — the documented stance)
    assert(sids("\\\"the fox\\\"") == Set.empty[Long])
  }

  test("conflicts: true in _find — decorated fetch leg, flag enforced, index path fetches") {
    import spark.implicits._
    val docs = Seq((1L, "en", 100L), (2L, "de", 300L), (3L, "en", 250L))
      .toDF("doc_id", "lang", "n_chars")
    // doc 1: clean; doc 2: one losing live rev; doc 3: losing rev is
    // a tombstone -> NOT a conflict
    val leaves = Seq(
      (1L, 2L, "aa", false),
      (2L, 2L, "bb", false), (2L, 2L, "a0", false),
      (3L, 2L, "cc", false), (3L, 1L, "dd", true))
      .toDF("doc_id", "rev_pos", "rev_hash", "deleted")
    val dec = Mango.withConflicts(docs, "doc_id", leaves, col("doc_id"),
      col("rev_pos"), col("rev_hash"), col("deleted"))
    val req = """{"selector": {"n_chars": {"$gte": 0}},
      | "fields": ["doc_id", "_conflicts"], "sort": ["doc_id"],
      | "limit": 100, "conflicts": true}""".stripMargin
    val got = Mango.find(dec, "doc_id", req)
      .select(col("doc_id"), concat_ws(",", col("_conflicts")).as("c"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, ""), (2L, "2-a0"), (3L, "")))
    // conflicts: false (the default) DROPS the decoration from output
    val plain = Mango.find(dec, "doc_id",
      """{"selector": {"n_chars": {"$gte": 0}},
        | "sort": ["doc_id"], "limit": 100}""".stripMargin)
    assert(!plain.columns.contains("_conflicts"))
    // conflicts: true without the decoration is LOUD
    intercept[IllegalArgumentException](Mango.find(docs, "doc_id", req))
    // the INDEX path serves conflicts too — and must fetch docs (an
    // index key cannot decode a conflict set), not cover
    val dir = java.nio.file.Files
      .createTempDirectory("mango-confl").toString
    val ix = Mango.createIndex(spark, docs, "doc_id", Seq("n_chars"),
      s"$dir/ix", numBuckets = 2)
    val reqIx = """{"selector": {"n_chars": {"$gte": 200}},
      | "fields": ["doc_id", "n_chars", "_conflicts"],
      | "sort": ["doc_id"], "limit": 100, "conflicts": true}""".stripMargin
    val gotIx = Mango.findIndexed(spark, dec, "doc_id", ix, reqIx)
      .select(col("doc_id"), concat_ws(",", col("_conflicts")).as("c"))
      .as[(Long, String)].collect().toSeq
    assert(gotIx == Seq((2L, "2-a0"), (3L, "")))
    // sanity: WITHOUT conflicts the same find covers (no doc fetch) —
    // the flag is exactly what forces the fetch
    val covered = Mango.findIndexed(spark, dec, "doc_id", ix,
      """{"selector": {"n_chars": {"$gte": 200}},
        | "fields": ["doc_id", "n_chars"], "sort": ["doc_id"],
        | "limit": 100}""".stripMargin)
    assert(covered.columns.toSeq == Seq("doc_id", "n_chars"))
  }

  test("explain reports the exact serve decision; $beginsWith picks an index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mango-explain").toString
    val byStatus = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderstatus", "o_orderdate"), s"$dir/st", numBuckets = 4)
    val byPri = Mango.createIndex(spark, orders, "o_orderkey",
      Seq("o_orderpriority"), s"$dir/pri", numBuckets = 4)
    val idxs = Seq(byStatus, byPri)
    def ex(req: String) =
      Mango.explain(req, idxs, "o_orderkey", orders.schema)
    // eq on the status index's first field wins; not covered (touches
    // o_totalprice)
    val e1 = ex("""{"selector": {"o_orderstatus": "F",
      "o_totalprice": {"$gt": 10000}},
      "fields": ["o_orderkey", "o_totalprice"]}""")
    assert(e1.index.contains(byStatus) && !e1.covered &&
      e1.bounds.isDefined)
    // covered: every touched field within {indexed fields, id}
    val e2 = ex("""{"selector": {"o_orderstatus": "F"},
      "fields": ["o_orderkey", "o_orderstatus"]}""")
    assert(e2.index.contains(byStatus) && e2.covered)
    // $beginsWith alone now scores as a range-closer → the priority
    // index serves (pickIndex credit added with the operator)
    val e3 = ex("""{"selector": {"o_orderpriority": {"$beginsWith": "1-"}},
      "fields": ["o_orderkey"]}""")
    assert(e3.index.contains(byPri) && e3.bounds.isDefined)
    // and findAuto takes the same path: equal to the scan find
    val req3 = """{"selector": {"o_orderpriority": {"$beginsWith": "1-"}},
      "fields": ["o_orderkey"], "sort": ["o_orderkey"], "limit": 100}"""
    assert(Mango.findAuto(spark, orders, "o_orderkey", idxs, req3)
      .collect().toSeq ==
      Mango.find(orders, "o_orderkey", req3).collect().toSeq)
    // nothing usable → full scan, stated
    val e4 = ex("""{"selector": {"o_totalprice": {"$gt": 10000}}}""")
    assert(e4.index.isEmpty && e4.reason.startsWith("full scan"))
    // use_index: a usable named index wins over the planner's pick;
    // an unknown name falls back to planning (CouchDB's behavior)
    val e5 = ex("""{"selector": {"o_orderstatus": "F",
      "o_orderpriority": {"$beginsWith": "1-"}},
      "use_index": "pri", "fields": ["o_orderkey"]}""")
    assert(e5.index.contains(byPri), s"use_index must win: $e5")
    val req5 = """{"selector": {"o_orderstatus": "F",
      "o_orderpriority": {"$beginsWith": "1-"}},
      "use_index": "pri", "fields": ["o_orderkey"],
      "sort": ["o_orderkey"], "limit": 100}"""
    assert(Mango.findAuto(spark, orders, "o_orderkey", idxs, req5)
      .collect().toSeq ==
      Mango.find(orders, "o_orderkey", req5).collect().toSeq)
    val e6 = ex("""{"selector": {"o_orderstatus": "F"},
      "use_index": "no-such-index", "fields": ["o_orderkey"]}""")
    assert(e6.index.contains(byStatus), "unknown use_index → planner")
    // an UNUSABLE use_index is ignored too (first field unconstrained)
    val e7 = ex("""{"selector": {"o_orderstatus": "F"},
      "use_index": "pri", "fields": ["o_orderkey"]}""")
    assert(e7.index.contains(byStatus), "unusable use_index → planner")
  }

  test("two text indexes: ambiguity rejected, use_index routes, explain agrees") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("mango-text2").toString
    val byText = Mango.createTextIndex(spark, docs, "doc_id", "text",
      s"$dir/bytext", nBuckets = 8)
    val bySource = Mango.createTextIndex(spark, docs, "doc_id", "source",
      s"$dir/bysource", nBuckets = 8)
    val req = """{"selector": {"$text": "src1"},
      "fields": ["doc_id"], "sort": ["doc_id"], "limit": 100000}"""
    // different stamped field sets + no use_index → loud error, and
    // explain throws exactly where findAuto would (decision parity)
    intercept[IllegalArgumentException](Mango.findAuto(spark, docs,
      "doc_id", Nil, Seq(byText, bySource), req))
    intercept[IllegalArgumentException](Mango.explain(req, Nil,
      Seq(byText, bySource), "doc_id", docs.schema))
    // use_index routes by name; results differ per index, proving the
    // route is load-bearing: "src1" appears in source values, not text
    def withUse(name: String) = req.replace(""""selector"""",
      s""""use_index": "$name", "selector"""")
    val viaSource = Mango.findAuto(spark, docs, "doc_id", Nil,
      Seq(byText, bySource), withUse("bysource"))
      .collect().map(_.getLong(0)).toSeq
    val wantSource = docs.filter(col("source") === "src1")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaSource == wantSource && viaSource.nonEmpty)
    val viaText = Mango.findAuto(spark, docs, "doc_id", Nil,
      Seq(byText, bySource), withUse("bytext"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaText.isEmpty, "'src1' is not a text-body token")
    // explain reports the same routed index findAuto serves from
    val exS = Mango.explain(withUse("bysource"), Nil,
      Seq(byText, bySource), "doc_id", docs.schema)
    assert(exS.textIndex.contains(bySource) && exS.index.isEmpty &&
      !exS.covered)
    // unknown use_index on $text is a loud error (never a silent pick)
    intercept[IllegalArgumentException](Mango.findAuto(spark, docs,
      "doc_id", Nil, Seq(byText, bySource), withUse("nope")))
    // same stamped field set → unambiguous without use_index
    val byText2 = Mango.createTextIndex(spark, docs, "doc_id", "text",
      s"$dir/bytext2", nBuckets = 8)
    assert(Mango.findAuto(spark, docs, "doc_id", Nil,
      Seq(byText, byText2), req).collect().isEmpty)
    // a non-$text find with text indexes present ignores them
    val exJ = Mango.explain("""{"selector": {"doc_id": {"$gt": 0}}}""",
      Nil, Seq(byText, bySource), "doc_id", docs.schema)
    assert(exJ.textIndex.isEmpty)
  }

  test("multi-field text index: a term matches in ANY stamped field") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("mango-textmf").toString
    val mf = Mango.createTextIndex(spark, docs, "doc_id",
      Seq("text", "source"), s"$dir/mf", nBuckets = 8,
      graft.operators.TextSearch.Analyzer())
    assert(Mango.openTextIndex(spark, s"$dir/mf") == mf &&
      mf.fields == Seq("text", "source"))
    // "src2" lives only in the source field; a text-body word lives
    // only in text — the conjunction must match across fields
    val someWord = docs.filter(col("source") === "src2")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .orderBy(col("count").desc, col("w")).head().getString(0)
    val req = s"""{"selector": {"$$text": "src2 $someWord"},
      "fields": ["doc_id"], "sort": ["doc_id"], "limit": 100000}"""
    val got = Mango.findText(spark, docs, "doc_id", mf, req)
      .collect().map(_.getLong(0)).toSeq
    val want = docs.filter(col("source") === "src2" &&
        array_contains(split(col("text"), "\\s+"), someWord))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty, s"${got.size} vs ${want.size}")
  }

  test("findTextPage: bookmark pages concatenate to the unpaged $text find") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("mango-textpg").toString
    val tix = Mango.createTextIndex(spark, docs, "doc_id", "text",
      s"$dir/tix", nBuckets = 8)
    val paged = """{"selector": {"$text": "merge filter",
      "n_chars": {"$gte": 100}},
      "fields": ["doc_id", "n_chars"], "sort": ["n_chars"], "limit": 7}"""
    var bm: Option[String] = None
    val acc = Seq.newBuilder[Row]
    var pages = 0
    var done = false
    while (!done) {
      val (p, nb) = Mango.findPageAuto(spark, docs, "doc_id", Nil,
        Seq(tix), paged, bm)
      val rows = p.collect()
      assert(rows.length <= 7)
      acc ++= rows
      pages += 1
      bm = nb
      done = nb.isEmpty
    }
    val unpaged = Mango.findText(spark, docs, "doc_id", tix,
      paged.replace("\"limit\": 7", "\"limit\": 1000000")).collect().toSeq
    val got = acc.result()
    assert(got == unpaged && pages >= 3,
      s"${got.size} rows in $pages pages vs ${unpaged.size} unpaged")
    // skip applies to the first page only (offset into the result)
    val (p1, _) = Mango.findTextPage(spark, docs, "doc_id", tix,
      paged.replace("\"limit\": 7", "\"skip\": 3, \"limit\": 7"))
    assert(p1.collect().toSeq == unpaged.slice(3, 10))
  }

  test("id-covered $text find serves from the postings alone (no doc scan)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("mango-textcov").toString
    val tix = Mango.createTextIndex(spark, docs, "doc_id", "text",
      s"$dir/tix", nBuckets = 8)
    // no residual, fields and sort touch only the id → index-only
    val req = """{"selector": {"$text": "merge filter"},
      "fields": ["doc_id"], "sort": ["doc_id"], "limit": 100000}"""
    val covered = Mango.findText(spark, docs, "doc_id", tix, req)
    val want = docs
      .filter(array_contains(split(col("text"), "\\s+"), "merge") &&
        array_contains(split(col("text"), "\\s+"), "filter"))
      .select("doc_id").orderBy("doc_id").collect().toSeq
    assert(covered.collect().toSeq == want && want.nonEmpty)
    // inspect the FINAL (post-AQE) plan: only the postings are read
    val planStr = covered.queryExecution.executedPlan.toString()
    assert(planStr.contains(s"$dir/tix"),
      s"expected a postings scan in:\n$planStr")
    assert(!planStr.contains("documents.parquet"),
      s"id-covered $$text must not scan the doc corpus:\n$planStr")
    // the paged covered serve agrees page-for-page too
    val (pg, _) = Mango.findTextPage(spark, docs, "doc_id", tix,
      req.replace("\"limit\": 100000", "\"limit\": 5"))
    assert(pg.collect().toSeq == want.take(5))
    // a non-id projection still takes the fetch path and agrees
    val req2 = """{"selector": {"$text": "merge filter"},
      "fields": ["doc_id", "source"], "sort": ["doc_id"], "limit": 100000}"""
    assert(Mango.findText(spark, docs, "doc_id", tix, req2).count() ==
      want.size)
  }

  test("upsertTextIndex maintains the stamped field set incrementally") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val dir = java.nio.file.Files.createTempDirectory("mango-textup").toString
    // multi-field index built over a PARTIAL corpus, then maintained:
    // late docs post, one doc edits (source change — a field only the
    // stamp knows to index), one doc deletes
    val early = docs.filter(col("doc_id") % 5 =!= 0)
    val late = docs.filter(col("doc_id") % 5 === 0)
    val mf = Mango.createTextIndex(spark, early, "doc_id",
      Seq("text", "source"), s"$dir/mf", nBuckets = 8,
      graft.operators.TextSearch.Analyzer())
    val editedId = early.agg(min(col("doc_id"))).head().getLong(0)
    val edited = early.filter(col("doc_id") === editedId)
      .withColumn("source", lit("srcedited"))
    val deletedId = early.filter(col("doc_id") =!= editedId)
      .agg(max(col("doc_id"))).head().getLong(0)
    val touched = Mango.upsertTextIndex(spark, mf,
      late.unionByName(edited), "doc_id", deletedIds = Seq(deletedId))
    assert(touched.nonEmpty)
    // the maintained index must serve EXACTLY like a fresh build over
    // the modified corpus
    val modified = docs.filter(col("doc_id") =!= deletedId)
      .withColumn("source",
        when(col("doc_id") === editedId, lit("srcedited"))
          .otherwise(col("source")))
    val fresh = Mango.createTextIndex(spark, modified, "doc_id",
      Seq("text", "source"), s"$dir/fresh", nBuckets = 8,
      graft.operators.TextSearch.Analyzer())
    for (q <- Seq("srcedited", "src1", "merge filter")) {
      val req = s"""{"selector": {"$$text": "$q"},
        "fields": ["doc_id"], "sort": ["doc_id"], "limit": 100000}"""
      val got = Mango.findText(spark, modified, "doc_id", mf, req)
        .as[Long].collect().toSeq
      val want = Mango.findText(spark, modified, "doc_id", fresh, req)
        .as[Long].collect().toSeq
      assert(got == want, s"'$q': maintained ${got.size} vs fresh ${want.size}")
    }
    // the edited source field is searchable, the deleted doc is gone
    val gotEdit = Mango.findText(spark, modified, "doc_id", mf,
      """{"selector": {"$text": "srcedited"},
         "fields": ["doc_id"], "limit": 100}""").as[Long].collect().toSeq
    assert(gotEdit == Seq(editedId))
  }

  test("validateDocs: every failed rule reported; split reuses one validation") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10.0, "1-URGENT"),
      (2L, -5.0, "1-URGENT"),   // fails price
      (3L, 10.0, "9-BOGUS"),    // fails priority
      (4L, -1.0, "9-BOGUS"))    // fails BOTH — both reported
      .toDF("id", "price", "prio")
    val rules = Seq(
      "price_pos" -> """{"price": {"$gt": 0}}""",
      "prio_known" -> """{"prio": {"$regex": "^[1-5]-"}}""")
    val got = Mango.validateDocs(docs, rules)
      .select($"id", $"_valid", $"_reasons").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq
    assert(got == Seq((1L, true, ""), (2L, false, "price_pos"),
      (3L, false, "prio_known"), (4L, false, "price_pos,prio_known")))
    val (ok, bad) = Mango.partitionValid(docs, rules)
    assert(ok.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(bad.columns.contains("_reasons") && bad.count() == 3)
    // no UDF: the whole validation is one codegen'd projection
    val plan = Mango.validateDocs(docs, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      s"validation must stay codegen'd:\n$plan")
    // duplicate rule names and empty rule sets are authoring errors
    intercept[IllegalArgumentException](
      Mango.validateDocs(docs, rules ++ rules.take(1)))
    intercept[IllegalArgumentException](Mango.validateDocs(docs, Nil))
  }

  // CouchDB 3.x partitioned-database Mango: ids "<partition>:<key>"
  private lazy val pOrders: DataFrame = orders.select(
    concat(lit("c"), (col("o_custkey") % 10).cast("string"),
      lit(":o"), col("o_orderkey").cast("string")).as("oid"),
    col("o_totalprice"), col("o_orderpriority"), col("o_orderstatus"))

  test("partitioned find: index-served == scoped scan; covered reads one _p dir, no docs") {
    val dir = java.nio.file.Files.createTempDirectory("mango-part").toString
    val idx = Mango.createIndexPartitioned(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/pidx", numTasks = 4)
    assert(idx.partitioned && Mango.openIndex(spark, s"$dir/pidx").partitioned)
    // fetch path: regex residual touches a non-indexed field
    val req = """{"selector": {"o_totalprice": {"$gte": 100000},
      "o_orderpriority": {"$regex": "^[12]-"}},
      "fields": ["oid", "o_totalprice", "o_orderpriority"],
      "sort": ["o_totalprice"], "limit": 100000}"""
    val got = Mango.findPartition(spark, pOrders, "oid", "c3", idx, req)
    val scoped = pOrders.filter(col("oid").startsWith("c3:"))
    val want = Mango.find(scoped, "oid", req).collect()
    assert(got.collect().map(_.toString).toSeq ==
      want.map(_.toString).toSeq && want.length > 10)

    // covered: selector+sort+projection ⊆ indexed fields + id — the
    // documents are never scanned and the index read prunes to _p=c3
    val reqCov = """{"selector":
      {"o_totalprice": {"$gte": 100000, "$lt": 150000}},
      "fields": ["oid", "o_totalprice"], "sort": ["o_totalprice"],
      "limit": 100000}"""
    val cov = Mango.findPartition(spark, pOrders, "oid", "c3", idx, reqCov)
    cov.collect()
    val plan = cov.queryExecution.executedPlan.toString
    assert(!plan.contains("orders.parquet"),
      s"covered partitioned find scanned the docs:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("_p"),
      s"no _p pruning in:\n$plan")
    val covWant = scoped
      .filter(col("o_totalprice") >= 100000 && col("o_totalprice") < 150000)
      .select(col("oid"), col("o_totalprice"))
      .orderBy(col("o_totalprice"), col("oid")).collect()
    assert(cov.collect().map(_.toString).toSeq ==
      covWant.map(_.toString).toSeq && covWant.nonEmpty)
  }

  test("partitioned index: global planner skips it; family mismatch rejected; fallback stays scoped") {
    val dir = java.nio.file.Files.createTempDirectory("mango-part2").toString
    val pidx = Mango.createIndexPartitioned(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/pidx", numTasks = 4)
    val sel = Mango.parseSelector("""{"o_totalprice": {"$gte": 1}}""")
    // a partitioned index cannot serve a GLOBAL find
    assert(Mango.pickIndex(sel, Seq(pidx), pOrders.schema).isEmpty)
    val gidx = Mango.createIndex(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/gidx", numBuckets = 4)
    assert(Mango.pickIndex(sel, Seq(pidx, gidx), pOrders.schema)
      .contains(gidx))
    // a global index cannot serve a partition-scoped find
    intercept[IllegalArgumentException](Mango.findPartition(spark,
      pOrders, "oid", "c3", gidx,
      """{"selector": {"o_totalprice": {"$gte": 1}}}"""))
    // unusable index (first field unconstrained) → the fallback is a
    // scan OF THE PARTITION, never the corpus
    val fb = Mango.findPartition(spark, pOrders, "oid", "c3", pidx,
      """{"selector": {"o_orderpriority": {"$regex": "^1-"}},
        "fields": ["oid"], "sort": ["oid"], "limit": 100000}""")
      .collect().map(_.getString(0))
    assert(fb.nonEmpty && fb.forall(_.startsWith("c3:")))
    val fbWant = pOrders.filter(col("oid").startsWith("c3:") &&
      col("o_orderpriority").rlike("^1-")).count()
    assert(fb.length == fbWant)
  }

  test("findPartitionAuto plans in the partitioned family; explainPartition states its decision") {
    val dir = java.nio.file.Files.createTempDirectory("mango-part4").toString
    val pidx = Mango.createIndexPartitioned(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/pidx", numTasks = 4)
    val gidx = Mango.createIndex(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/gidx", numBuckets = 4)
    val sel = Mango.parseSelector("""{"o_totalprice": {"$gte": 100000}}""")
    // the scoped planner only ever offers partitioned indexes
    assert(Mango.pickIndexPartition(sel, Seq(gidx, pidx), pOrders.schema)
      .contains(pidx))
    assert(Mango.pickIndexPartition(sel, Seq(gidx), pOrders.schema).isEmpty)
    val req = """{"selector": {"o_totalprice": {"$gte": 100000}},
      "fields": ["oid", "o_totalprice"], "sort": ["o_totalprice"],
      "limit": 100000}"""
    val auto = Mango.findPartitionAuto(spark, pOrders, "oid", "c3",
      Seq(gidx, pidx), req)
    val want = Mango.findPartition(spark, pOrders, "oid", "c3", pidx, req)
      .collect()
    assert(auto.collect().map(_.toString).toSeq ==
      want.map(_.toString).toSeq && want.nonEmpty)
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_p"),
      s"auto-served scoped find not _p-pruned:\n$plan")
    // explain parity: the report is the decision the auto path took
    val ex = Mango.explainPartition(req, Seq(gidx, pidx), "oid",
      pOrders.schema, "c3")
    assert(ex.index.contains(pidx) && ex.covered &&
      ex.reason.contains("c3") && ex.bounds.isDefined)
    // no usable partitioned index → both report and serve a scan OF
    // THE PARTITION (the global index must not resurface here)
    val reqNone = """{"selector": {"o_orderpriority": {"$regex": "^1-"}},
      "fields": ["oid"], "sort": ["oid"], "limit": 100000}"""
    val exNone = Mango.explainPartition(reqNone, Seq(gidx, pidx), "oid",
      pOrders.schema, "c3")
    assert(exNone.index.isEmpty && exNone.reason.contains("partition scan"))
    val fb = Mango.findPartitionAuto(spark, pOrders, "oid", "c3",
      Seq(gidx, pidx), reqNone).collect().map(_.getString(0))
    assert(fb.nonEmpty && fb.forall(_.startsWith("c3:")))
  }

  test("findPartitionPage: scoped pages concatenate exactly; one _p dir; family guarded") {
    val dir = java.nio.file.Files.createTempDirectory("mango-part5").toString
    val pidx = Mango.createIndexPartitioned(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/pidx", numTasks = 4)
    val req = """{"selector": {"o_totalprice": {"$gte": 50000},
      "o_orderpriority": {"$regex": "^[1-4]-"}},
      "fields": ["oid", "o_totalprice", "o_orderpriority"],
      "sort": ["o_totalprice"], "limit": 25}"""
    var bm: Option[String] = None
    var lastBm: Option[String] = None
    var acc = Vector.empty[Row]
    var pages = 0
    var done = false
    while (!done) {
      val (p, nb) = Mango.findPartitionPage(spark, pOrders, "oid", "c3",
        pidx, req, bm)
      acc ++= p.collect(); pages += 1
      lastBm = bm; bm = nb; done = nb.isEmpty
    }
    // every page's fetch plan prunes to the ONE _p directory — and a
    // resumed page ALSO carries a cursor-tightened _ck lower bound
    // (a second pushed >= on the index scan, from the bookmark)
    val ckLoRe = """\(_ck#\d+ >= 0x""".r
    def planOf(b: Option[String]): String = {
      val Some((fetch, _, _, _)) = Mango.pagePlanPartition(spark, pOrders,
        "oid", "c3", pidx, req, b)
      fetch.limit(51).queryExecution.executedPlan.toString()
    }
    val planFirst = planOf(None)
    val planDeep = planOf(lastBm)
    for ((plan, which) <- Seq((planFirst, "first"), (planDeep, "deep"))) {
      assert(plan.contains("PartitionFilters") && plan.contains("= c3)"),
        s"$which scoped page not _p-pruned:\n$plan")
    }
    val nFirst = ckLoRe.findAllMatchIn(planFirst).size
    val nDeep = ckLoRe.findAllMatchIn(planDeep).size
    assert(nDeep > nFirst && nFirst >= 1,
      s"resumed scoped page lost the cursor _ck bound " +
        s"($nFirst lower bounds -> $nDeep):\n$planDeep")
    val want = Mango.findPartition(spark, pOrders, "oid", "c3", pidx,
      req.replace("\"limit\": 25", "\"limit\": 1000000")).collect().toSeq
    assert(acc.map(_.toString) == want.map(_.toString) && pages > 2,
      s"scoped pages (${acc.size} rows, $pages pages) != unpaged " +
        s"(${want.size})")
    // family discipline is loud in both directions
    val gidx = Mango.createIndex(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/gidx", numBuckets = 4)
    intercept[IllegalArgumentException](
      Mango.findPartitionPage(spark, pOrders, "oid", "c3", gidx, req))
    intercept[IllegalArgumentException](
      Mango.findPageIndexed(spark, pOrders, "oid", pidx, req))
    // un-pageable request → scan paging OF THE PARTITION
    val reqFb = """{"selector": {"o_orderpriority": {"$regex": "^1-"}},
      "fields": ["oid"], "sort": ["oid"], "limit": 30}"""
    val (fb, _) = Mango.findPartitionPage(spark, pOrders, "oid", "c3",
      pidx, reqFb)
    val fbIds = fb.collect().map(_.getString(0))
    assert(fbIds.nonEmpty && fbIds.forall(_.startsWith("c3:")))
  }

  test("upsertIndexPartitioned == rebuild; partial filter maintained through flips") {
    val dir = java.nio.file.Files.createTempDirectory("mango-part3").toString
    val pf = """{"o_orderstatus": "O"}"""
    val idx = Mango.createIndexPartitioned(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$dir/pidx", numTasks = 4,
      partialFilter = Some(pf))
    val c2 = pOrders.filter(col("oid").startsWith("c2:"))
    val os = c2.filter(col("o_orderstatus") === "O").orderBy(col("oid"))
      .select("oid").collect().map(_.getString(0))
    val aId = os.head // O stays O, price changes
    val bId = os.last // O -> F: stops matching, rows must drop
    val cId = c2.filter(col("o_orderstatus") === "F").orderBy(col("oid"))
      .head().getString(0) // F -> O: starts matching
    val changed = pOrders.filter(col("oid").isin(aId, bId, cId))
      .withColumn("o_totalprice", when(col("oid") === aId,
        col("o_totalprice") + 1000.0).otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus", when(col("oid") === bId, lit("F"))
        .when(col("oid") === cId, lit("O"))
        .otherwise(col("o_orderstatus")))
    Mango.upsertIndexPartitioned(spark, pOrders, "oid", idx, changed,
      newSeq = 5L)
    val post = pOrders.filter(!col("oid").isin(aId, bId, cId))
      .unionByName(changed)
    val rebuilt = Mango.createIndexPartitioned(spark, post, "oid",
      Seq("o_totalprice"), s"$dir/rebuilt", numTasks = 4,
      partialFilter = Some(pf))
    def dump(p: String) = graft.view.PartitionedStore.open(spark, p)
      .select(col("_id"), col("key")).collect().map(_.toString).sorted.toSeq
    assert(dump(idx.path) == dump(rebuilt.path))
    assert(graft.view.IndexStore.readMeta(spark, idx.path).updateSeq == 5L)
  }

  test("executionStats: keys/docs/results agree with the plan it profiles") {
    val dir = java.nio.file.Files.createTempDirectory("mango-xs").toString
    val docs = orders.select(col("o_orderkey").as("id"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
    val idx = Mango.createIndex(spark, docs, "id",
      Seq("o_orderstatus", "o_totalprice"), s"$dir/ix", numBuckets = 2)
    def st(find: String) = Mango.executionStats(spark, docs, "id",
        Seq(idx), find).head()
    val find = """{"selector": {"o_orderstatus": "F",
      "o_totalprice": {"$lt": 150000}}, "fields": ["id"],
      "limit": 1000000}"""
    val s1 = st(find)
    val expKeys = docs.filter(col("o_orderstatus") === "F" &&
      col("o_totalprice") < 150000).count()
    val expRes = Mango.findAuto(spark, docs, "id", Seq(idx), find).count()
    assert(s1.getString(0) == idx.name && s1.getBoolean(1), // covered
      s"expected a covered indexed route: $s1")
    assert(s1.getLong(2) == expKeys && s1.getLong(3) == 0L &&
      s1.getLong(4) == expRes, s"covered stats wrong: $s1")
    // a projection outside the index forces the fetch route
    val s2 = st("""{"selector": {"o_orderstatus": "F",
      "o_totalprice": {"$lt": 150000}},
      "fields": ["id", "o_orderpriority"], "limit": 1000000}""")
    assert(!s2.getBoolean(1) && s2.getLong(3) == expKeys,
      s"fetch stats wrong: $s2")
    // no usable index: the scan route reports the corpus as examined
    val s3 = st("""{"selector": {"o_orderpriority": "1-URGENT"},
      "limit": 1000000}""")
    assert(s3.getString(0) == "_all_docs" && s3.getLong(2) == 0L &&
      s3.getLong(3) == docs.count(), s"scan stats wrong: $s3")
  }

  test("index administration: list reflects create/delete; deletes are guarded") {
    val root = java.nio.file.Files.createTempDirectory("mango-adm").toString
    def listing: Seq[(String, String, String, String, Boolean)] =
      Mango.listIndexes(spark, root)
        .select(col("name"), col("type"), concat_ws(",", col("fields")),
          coalesce(col("partial_filter"), lit("")), col("partitioned"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getBoolean(4))).toSeq
    // an empty root still reports the special primary index
    assert(listing == Seq(("_all_docs", "special", "_id", "", false)))
    val docs = orders.limit(50).select(col("o_orderkey").as("id"),
      col("o_orderstatus"), col("o_totalprice"))
    Mango.createIndex(spark, docs, "id", Seq("o_orderstatus"),
      s"$root/by_status")
    Mango.createIndex(spark, docs, "id", Seq("o_totalprice"),
      s"$root/big_open", partialFilter =
        Some("""{"o_orderstatus": {"$eq": "O"}}"""))
    Mango.createIndexPartitioned(spark, pOrders, "oid",
      Seq("o_totalprice"), s"$root/p_price", numTasks = 2)
    assert(listing == Seq(
      ("_all_docs", "special", "_id", "", false),
      ("big_open", "json", "o_totalprice",
        """{"o_orderstatus": {"$eq": "O"}}""", false),
      ("by_status", "json", "o_orderstatus", "", false),
      ("p_price", "json", "o_totalprice", "", true)),
      s"listing after create wrong: $listing")
    // a foreign (unstamped) directory is never listed and never deleted
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/not_an_index"))
    assert(!listing.exists(_._1 == "not_an_index"))
    intercept[IllegalArgumentException] {
      Mango.deleteIndex(spark, root, "not_an_index")
    }
    // delete is loud on misses and refuses the primary index
    intercept[IllegalArgumentException] {
      Mango.deleteIndex(spark, root, "nope")
    }
    intercept[IllegalArgumentException] {
      Mango.deleteIndex(spark, root, "_all_docs")
    }
    Mango.deleteIndex(spark, root, "big_open")
    assert(listing.map(_._1) ==
      Seq("_all_docs", "by_status", "p_price"))
    // and the dropped index is really gone from disk
    assert(!new java.io.File(s"$root/big_open").exists())
  }
}
