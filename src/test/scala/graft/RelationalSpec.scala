package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.sources.EventTime.withTsUs(
      spark.read.parquet(s"$sfDir/events.parquet"))
  }

  test("approxPercentiles: rank error within the GK accuracy bound") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val accuracy = 10000
    val got = Relational.approxPercentiles(orders, $"o_orderstatus",
      $"o_totalprice", Seq("p50" -> 0.5, "p90" -> 0.9), accuracy)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val byGroup = orders.select($"o_orderstatus", $"o_totalprice")
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == byGroup.keySet && got.nonEmpty)
    for ((g, vals) <- byGroup; (p, v) <- Seq(0.5 -> got(g)._1,
                                             0.9 -> got(g)._2)) {
      val n = vals.length
      // GK guarantee: the returned value's rank is within n/accuracy
      // of ceil(p*n); +1 absorbs the round4 output grain
      val rank = vals.count(_ <= v)
      val target = math.ceil(p * n)
      val tol = n.toDouble / accuracy + 1
      assert(math.abs(rank - target) <= tol,
        s"group $g p$p: rank $rank vs target $target (n=$n, tol=$tol)")
    }
    // and the exact path agrees with itself as the reference
    val exact = Relational.percentiles(orders, $"o_orderstatus",
      $"o_totalprice", Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect()
    assert(exact.length == got.size)
  }

  test("asofJoin matches brute-force inequality join") {
    val purchases = events.filter($"event_type" === "purchase")
    val signups = events.filter($"event_type" === "signup")
    val got = Relational.asofJoin(purchases, signups, "user_id",
      col("ts_us"), Seq("event_id"))
      .select($"event_id", $"asof_ts").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    // brute force: max signup ts <= purchase ts per user (test-only oracle;
    // the production operator must never plan an inequality join)
    val brute = purchases.as("p").join(signups.as("s"),
        $"p.user_id" === $"s.user_id" && $"s.ts_us" <= $"p.ts_us", "left")
      .groupBy($"p.event_id").agg(max($"s.ts_us").as("asof_ts"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("sessionize: session ids are contiguous from 1 and break on gaps") {
    val s = Relational.sessionize(events, $"user_id", $"ts_us", 1800L * 1000000L)
      .select($"user_id", $"ts_us", $"session_id")
      .orderBy($"user_id", $"ts_us").collect()
    var prevUser = -1L; var prevTs = 0L; var prevSess = 0L
    s.foreach { r =>
      val (u, ts, sess) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (u != prevUser) assert(sess == 1L)
      else if (ts - prevTs > 1800L * 1000000L) assert(sess == prevSess + 1)
      else assert(sess == prevSess)
      prevUser = u; prevTs = ts; prevSess = sess
    }
  }

  test("hoppingAgg: each event covers width/slide windows; reduces to tumbling") {
    val hour = 3600L * 1000000L
    val tiny = Seq(
      (0L * hour + 10L, 1.0),  // hour 0 → windows starting at -1, 0
      (1L * hour + 10L, 2.0),  // hour 1 → windows 0, 1
      (3L * hour + 10L, 4.0)   // hour 3 → windows 2, 3
    ).toDF("ts_us", "value")
    val got = Relational.hoppingAgg(tiny, $"ts_us", 2, 1, $"value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // window 0 holds hours 0 and 1; window 1 holds hour 1 only
    assert(got(0L) == (2L, 3.0), s"window 0: ${got(0L)}")
    assert(got(1L) == (1L, 2.0))
    assert(got(2L) == (1L, 4.0) && got(3L) == (1L, 4.0))
    // every event lands in exactly width/slide = 2 windows
    assert(got.values.map(_._1).sum == 3 * 2)
    // width == slide degenerates to the tumbling aggregation
    val hop1 = Relational.hoppingAgg(events, $"ts_us", 1, 1, $"value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val tum = Relational.tumblingAgg(events, $"ts_us", 1, $"value")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(hop1 == tum, "slide==width must equal tumbling")
    // slide must divide width
    intercept[IllegalArgumentException] {
      Relational.hoppingAgg(events, $"ts_us", 3, 2, $"value")
    }
  }

  test("saltedJoin: result equals the plain join, rows spread over salts") {
    val big = (1L to 1000L).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val got = Relational.saltedJoin(big, small, "k", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val plain = big.join(small, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == plain, "salted join must equal the plain join")
    // the salted big side actually uses >1 salt per hot key (the whole
    // point — one reducer no longer absorbs a hot key), and the salt
    // is DETERMINISTIC (content-hashed) so retried tasks re-salt alike
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8L))
        .cast("int"))
    assert(salted.filter($"k" === 0L).select($"_salt").distinct()
      .count() > 1, "a hot key must spread over multiple salts")
    assert(salted.collect().toSeq == salted.collect().toSeq)
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(big, small, "k", 1)
    }
  }

  test("saltedJoin: user _salt column survives; saltCols narrows the hash input") {
    // an input that already carries a `_salt` column must not be
    // clobbered by the working column
    val big = (1L to 100L).map(i => (i % 3, i, s"mine$i"))
      .toDF("k", "v", "_salt")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val got = Relational.saltedJoin(big, small, "k", 4)
    assert(got.columns.toSeq == Seq("k", "v", "_salt", "name"))
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(rows == plain, "user _salt data must pass through unchanged")
    // wide fact table: saltCols restricts the per-row hash to the named
    // columns — the plan's xxhash64 must reference only those
    val wide = (1L to 100L).map(i =>
      (i % 3, i, "w1" * 10, "w2" * 10, "w3" * 10))
      .toDF("k", "seq", "wide1", "wide2", "wide3")
    val narrow = Relational.saltedJoin(wide, small, "k", 4,
      saltCols = Seq($"k", $"seq"))
    val plan = narrow.queryExecution.analyzed.toString
    val hashExpr = "xxhash64\\([^)]*\\)".r.findFirstIn(plan)
      .getOrElse(fail(s"no xxhash64 in plan: $plan"))
    assert(hashExpr.contains("k#") && hashExpr.contains("seq#"),
      s"salt must hash the named columns: $hashExpr")
    assert(!hashExpr.contains("wide"),
      s"salt must NOT hash the wide payload columns: $hashExpr")
    val nRows = wide.join(small, Seq("k")).count()
    assert(narrow.count() == nRows, "narrowed salt keeps the join exact")
  }

  test("withGlobalRowNumber equals a window row_number without the single partition") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val got = Relational.withGlobalRowNumber(
      orders.select($"o_orderkey", $"o_totalprice"),
      Seq($"o_totalprice", $"o_orderkey")).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("rank")).toMap
    val exp = orders.select($"o_orderkey",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"o_totalprice", $"o_orderkey")).cast("long").as("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("withGlobalPrefixSum equals the window running total without the single partition") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val got = Relational.withGlobalPrefixSum(orders,
      Seq($"o_custkey", $"o_orderkey"), $"o_custkey").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("cum_before"))
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"o_custkey", $"o_orderkey")
      .rowsBetween(Long.MinValue, -1)
    val exp = orders.select($"o_orderkey",
        coalesce(sum($"o_custkey").over(w), lit(0L)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("shardByTokenBudget: budget-crossing closes, unsplit docs, partitioning-invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val budget = 300L
    def run(df: org.apache.spark.sql.DataFrame) =
      Relational.shardByTokenBudget(df, $"doc_id",
        graft.operators.Text.tokenCount($"text"), budget)
    val got = run(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // shard is exactly the budget quotient of the doc's start offset
    assert(got.forall { case (_, _, cum, sh) => sh == cum / budget })
    // in shard order, a new shard starts exactly when the running total
    // crossed its boundary — no empty shard skipped, ids dense
    val shards = got.map(_._4).distinct.sorted
    assert(shards.head == 0L)
    // dense except where one huge doc spans multiple budgets; with a
    // 300-token budget and ~60-token docs every id must be consecutive
    assert(shards.zip(shards.tail).forall { case (a, b) => b == a + 1 })
    // deterministic under input partitioning
    val again = run(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("q38 conditional aggregation equals INTERSECT/EXCEPT operators") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val high = o.filter($"o_orderpriority" === "2-HIGH").select($"o_custkey")
    val exp = urgent.intersect(high).withColumn("tag", lit("both"))
      .unionByName(urgent.except(high).withColumn("tag", lit("urgent_only")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = SparkEntry.queries("q38_set_ops")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("q47 single left join equals LEFT SEMI / LEFT ANTI joins") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val semi = c.join(urgent, c("c_custkey") === urgent("o_custkey"),
      "left_semi").select($"c_custkey", lit("has_urgent").as("tag"))
    val anti = c.join(urgent, c("c_custkey") === urgent("o_custkey"),
      "left_anti").select($"c_custkey", lit("none").as("tag"))
    val exp = semi.unionByName(anti)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = SparkEntry.queries("q47_semi_anti")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("topKPerGroupBounded equals the window form (few-group top-k)") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"o_orderpriority", $"rank", $"o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val win = norm(Relational.topKPerGroup(orders, Seq($"o_orderpriority"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 3))
    val bounded = norm(Relational.topKPerGroupBounded(orders,
      Seq("o_orderpriority"), $"o_totalprice", $"o_orderkey", 3))
    assert(bounded == win && bounded.nonEmpty)
  }

  test("topKPerGroup returns exactly k ranked rows per group") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val r = Relational.topKPerGroup(orders, Seq($"o_orderpriority"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
    val counts = r.groupBy($"o_orderpriority").count().collect()
    counts.foreach(row => assert(row.getLong(1) == 3))
    val ranks = r.select($"rank").distinct().as[Long].collect().sorted
    assert(ranks.toSeq == Seq(1L, 2L, 3L))
  }

  test("stratified sample: exact floor quota per stratum, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang")
    val expected = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 5).toMap
    val got = Relational.stratifiedSampleExact(docs, $"lang", $"doc_id", 1, 5)
    val perStratum = got.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum == expected.filter(_._2 > 0),
      s"quota mismatch: $perStratum vs $expected")
    // deterministic: same rows on a second run
    val a = got.select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Relational.stratifiedSampleExact(docs, $"lang", $"doc_id", 1, 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // a 4/5 quota keeps everything the 1/5 quota keeps growing: the
    // hash order makes quotas NESTED (a bigger split contains the
    // smaller) — what incremental train-set growth relies on
    val big = Relational.stratifiedSampleExact(docs, $"lang", $"doc_id", 4, 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(a.toSet.subsetOf(big))
  }

  test("mixDomains: per-domain exact rates, zero-rate drop, default rate") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source", $"lang")
    val rates = Map("src0" -> ((1, 2)), "src1" -> ((0, 1)),
      "src2" -> ((1, 1)))
    val got = Relational.mixDomains(docs, $"source", $"doc_id",
      rates, default = (1, 4))
    val perDomain = got.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, cnt) <- totals) {
      val (n, d) = rates.getOrElse(src, (1, 4))
      val want = cnt * n / d
      assert(perDomain.getOrElse(src, 0L) == want,
        s"$src: got ${perDomain.get(src)}, want $want of $cnt")
    }
    assert(!perDomain.contains("src1"), "zero-rate domain must vanish")
    // full-rate domain keeps every row, schema untouched
    assert(perDomain("src2") == totals("src2"))
    assert(got.columns.toSeq == Seq("doc_id", "source", "lang"))
    // a domain's kept set is independent of OTHER domains' rates
    val again = Relational.mixDomains(docs, $"source", $"doc_id",
      rates + ("src3" -> ((1, 9))), default = (1, 4))
    def ids(df: org.apache.spark.sql.DataFrame, s: String) =
      df.filter($"source" === s).select($"doc_id").as[Long].collect().toSet
    assert(ids(got, "src0") == ids(again, "src0"))
  }

  test("temperatureMix: exact integer split, rare domains upweighted, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source")
    val totals = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = totals.values.sum / 2
    val got = Relational.temperatureMix(docs, $"source", $"doc_id", budget)
    val per = got.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact split: target_d = budget * floor(sqrt(n_d)) div sum(w)
    val w = totals.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val wsum = w.values.sum
    for ((src, cnt) <- totals) {
      val want = math.min(budget * w(src) / wsum, cnt)
      assert(per.getOrElse(src, 0L) == want,
        s"$src: got ${per.get(src)}, want $want of $cnt")
    }
    // temperature flattens: every smaller domain keeps at least the
    // kept FRACTION of every larger domain (α=0.5 monotonicity)
    val fracs = totals.toSeq.map { case (s2, n) =>
      (n, per.getOrElse(s2, 0L).toDouble / n) }.sortBy(_._1)
    fracs.sliding(2).foreach {
      case Seq((nA, fA), (nB, fB)) =>
        // integer floors can nudge a fraction by up to ~1/n each side
        assert(fA >= fB - 2.0 / math.min(nA, nB),
          s"domain of $nA rows kept $fA < $fB of $nB rows")
      case _ =>
    }
    // deterministic: the kept id set reproduces exactly
    val again = Relational.temperatureMix(docs, $"source", $"doc_id",
      budget).select($"doc_id").as[Long].collect().toSet
    assert(again == got.select($"doc_id").as[Long].collect().toSet)
  }

  test("epochShuffle: portable keyed permutation, seeds independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id")
    val n = docs.count()
    val e1 = Relational.epochShuffle(docs, $"doc_id", "e1")
    val rows = e1.select($"doc_id", $"pos").as[(Long, Long)].collect()
    assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq,
      "pos must be a 1..n permutation")
    // the order is exactly the md5 keyed order (portable contract)
    val want = docs.select($"doc_id",
        md5(concat(lit("e1:"), $"doc_id".cast("string")).cast("binary"))
          .as("h"))
      .orderBy($"h", $"doc_id").select($"doc_id").as[Long]
      .collect().toSeq
    assert(rows.sortBy(_._2).map(_._1).toSeq == want)
    // a different seed is a genuinely different permutation
    val e2 = Relational.epochShuffle(docs, $"doc_id", "e2")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    val moved = rows.count { case (id, p) => e2(id) != p }
    assert(moved > n / 2, s"only $moved of $n moved between epochs")
  }

  test("upsampleDomains: exact fractional-epoch totals; rate<1 == mixDomains") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source", $"lang")
    val rates = Map("src0" -> ((5, 2)), "src1" -> ((1, 3)),
      "src2" -> ((0, 1)))
    val got = Relational.upsampleDomains(docs, $"source", $"doc_id",
      rates, default = (1, 1))
    val perDomain = got.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, cnt) <- totals) {
      val (n, d) = rates.getOrElse(src, (1, 1))
      assert(perDomain.getOrElse(src, 0L) == cnt * n / d,
        s"$src: got ${perDomain.get(src)}, want ${cnt * n / d} of $cnt")
    }
    // copy indexes are dense per row: 0..copies-1
    val badCopies = got.groupBy($"doc_id").agg(
        org.apache.spark.sql.functions.max($"copy").as("mx"),
        org.apache.spark.sql.functions.count($"copy").as("n"))
      .filter($"mx" =!= $"n" - 1).count()
    assert(badCopies == 0, "copy indexes must be 0..copies-1")
    // a pure-downsampling rate keeps exactly mixDomains' rows at copy 0
    val down = Relational.upsampleDomains(docs, $"source", $"doc_id",
      Map("src0" -> ((1, 2))), default = (1, 1))
      .filter($"source" === "src0")
    val mixed = Relational.mixDomains(docs, $"source", $"doc_id",
      Map("src0" -> ((1, 2))), default = (1, 1))
      .filter($"source" === "src0")
    assert(down.select($"doc_id").as[Long].collect().toSet ==
      mixed.select($"doc_id").as[Long].collect().toSet)
    assert(down.filter($"copy" =!= 0L).count() == 0)
  }

  test("weightedSampleExact: weight-proportional odds, deterministic, loud on w<=0") {
    import graft.operators.Relational
    // 2000 rows: ids 0-999 weight 1, ids 1000-1999 weight 9
    val df = spark.range(2000L).select($"id",
      when($"id" >= 1000L, 9.0).otherwise(1.0).as("w"))
    val kept = Relational.weightedSampleExact(df, $"id", $"w", 400)
      .select($"id").as[Long].collect().toSet
    assert(kept.size == 400)
    val heavy = kept.count(_ >= 1000L)
    // E[heavy] ~ 360 under A-Res (9:1 odds); a uniform sampler
    // would put ~200 — the gap is the property under test
    assert(heavy > 300 && heavy < 400,
      s"9x-weighted rows should dominate the sample, got $heavy/400")
    // deterministic across reruns; seed changes the sample
    val again = Relational.weightedSampleExact(df, $"id", $"w", 400)
      .select($"id").as[Long].collect().toSet
    assert(again == kept)
    val seeded = Relational.weightedSampleExact(df, $"id", $"w", 400,
      seed = "other").select($"id").as[Long].collect().toSet
    assert(seeded != kept, "a new seed must draw a different sample")
    // plans as a global TakeOrdered, not a full sort or window
    val plan = Relational.weightedSampleExact(df, $"id", $"w", 400)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must plan as TakeOrdered:\n${plan.take(800)}")
    // non-positive weights fail loudly, not silently as key = NaN
    intercept[Exception] {
      Relational.weightedSampleExact(
        spark.range(5L).select($"id", lit(0.0).as("w")),
        $"id", $"w", 2).collect()
    }
  }
}
