package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.gfunctions.round4

/** Relational operators a production user of a map/reduce view engine also
  * needs — expressed as declarative DataFrame plans so Catalyst handles
  * pushdown/pruning and AQE handles skew. Every operator here is designed
  * for the 100 TB posture described in SURVEY.md §4: dims broadcast, facts
  * shuffle at most once on their natural key, no inequality-join blowups.
  *
  * Time parameters are epoch-micros long columns (`tsMicros`) — integral,
  * engine-portable, and immune to timestamp-precision mismatches.
  */
object Relational {

  /** Top-k rows per group by the given ordering (reference pattern:
    * "first k view rows per key prefix"). One shuffle on the partition
    * keys; rank assigned within each group after the shuffle. Fine when
    * group cardinality is high (rows spread over many partitions); for
    * FEW groups over a huge table use [[topKPerGroupBounded]], which
    * never funnels a whole group through one partition. */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-k per group for LOW group cardinality over huge tables: the
    * window form above shuffles every row of a group to one partition;
    * this one keeps k (score, id) pairs per group per partition
    * map-side (the bounded [[graft.functions.TopKPairs]] aggregate) and
    * joins only the winners back for their full rows. Ranking is score
    * DESC with id ASC tie-break — identical to
    * `row_number over (order by score desc, id asc)`. `id` must be a
    * unique long. */
  def topKPerGroupBounded(df: DataFrame, groupCols: Seq[String],
                          score: Column, id: Column, k: Int): DataFrame = {
    val agg = udaf(new graft.functions.TopKPairs(k))
    val winners = df
      .groupBy(groupCols.map(col): _*)
      .agg(agg(score.cast("double"), id.cast("long")).as("_top"))
      .select(groupCols.map(col) :+
        posexplode(col("_top")).as(Seq("_i", "_t")): _*)
      .select(groupCols.map(col) :+
        (col("_i") + 1).cast("long").as("rank") :+
        col("_t._2").as("_win_id"): _*)
      .select(col("_win_id"), col("rank"))
    df.withColumn("_row_id", id.cast("long"))
      .join(broadcast(winners), col("_row_id") === col("_win_id"))
      .drop("_row_id", "_win_id")
  }

  /** Tumbling time-window aggregation: one shuffle on the bucket,
    * partial aggregation map-side. */
  def tumblingAgg(df: DataFrame, tsMicros: Column, widthHours: Int,
                  value: Column): DataFrame = {
    val width = widthHours * 3600L * 1000000L
    df.groupBy(floor(tsMicros / width).cast("long").as("bucket")).agg(
      count(lit(1)).as("cnt"),
      sum(value.cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Hopping (sliding) window aggregation: windows of `widthHours`
    * advancing every `slideHours` — each event lands in
    * `width/slide` overlapping windows, materialized by exploding the
    * covering window-start sequence per row (a bounded fan-out of
    * width/slide, not a self-join or a per-window pass) and partial-
    * aggregating by window start. `slide` must divide `width` (the
    * aligned-hop contract — same as Spark's own `window()`); decimal-
    * exact sums. Returns `(win_start, cnt, sum_value)` with
    * `win_start` in hop units since epoch. */
  def hoppingAgg(df: DataFrame, tsMicros: Column, widthHours: Int,
                 slideHours: Int, value: Column): DataFrame = {
    require(widthHours > 0 && slideHours > 0 &&
      widthHours % slideHours == 0,
      "slide must divide width (aligned hopping windows)")
    val slide = slideHours * 3600L * 1000000L
    val hops = widthHours / slideHours
    // the hop-aligned window starts covering ts:
    // floor(ts/slide) - (hops-1) .. floor(ts/slide)
    val lastHop = floor(tsMicros / slide).cast("long")
    df.select(value.cast("decimal(18,2)").as("_v"),
        explode(sequence(lastHop - (hops - 1), lastHop)).as("win_start"))
      .groupBy(col("win_start")).agg(
        count(lit(1)).as("cnt"),
        sum(col("_v")).cast("double").as("sum_value"))
  }

  /** Gap-based sessionization: a session breaks when the time since the
    * previous row of the same key exceeds `gapMicros`. Two window passes
    * over a single shuffle on the key — no state store needed in batch. */
  def sessionize(df: DataFrame, key: Column, tsMicros: Column,
                 gapMicros: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(tsMicros)
    val gap = tsMicros - lag(tsMicros, 1).over(byKey)
    df.withColumn("_new_session",
        when(gap.isNull || gap > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** As-of join via the union+window trick: tag both streams, union them,
    * and carry the last right-side timestamp forward with a running window —
    * one shuffle on the key, NO inequality join (which would plan as a
    * broadcast-nested-loop and explode at scale). For every left row,
    * attaches `asof_ts` = the greatest right `tsMicros` &lt;= the left
    * row's, per key. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsMicros: Column, leftCols: Seq[String]): DataFrame = {
    val l = left.select(col(key), tsMicros.as("_ts"),
      struct(leftCols.map(col): _*).as("_l"))
      .withColumn("_side", lit(0))
      .withColumn("_rts", lit(null).cast("long"))
    val r = right.select(col(key), tsMicros.as("_ts"))
      .withColumn("_l", lit(null))
      .withColumn("_side", lit(1))
      .withColumn("_rts", col("_ts"))
    val w = Window.partitionBy(col(key))
      // right rows sort before left rows at the same timestamp, so a
      // same-instant right row IS visible to the left row (asof <=)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lSchema = l.schema("_l").dataType
    l.unionByName(r.withColumn("_l", col("_l").cast(lSchema)))
      .withColumn("asof_ts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(col(key) +: col("_ts").as("ts_us") +: col("asof_ts") +:
        leftCols.map(c => col("_l").getField(c).as(c)): _*)
  }

  /** Range join: count right rows whose ts falls in
    * [left.ts, left.ts + windowMicros). Planned as an equi-join on the key
    * with the range as a post-join filter (sort-merge on the key) — scales
    * with key cardinality, never a nested-loop cross product. */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String,
                     tsMicros: Column, idCol: String,
                     windowMicros: Long): DataFrame = {
    val l = left.select(col(key).as("_k"), tsMicros.as("_lts"),
      col(idCol).as(idCol))
    val r = right.select(col(key).as("_k"), tsMicros.as("_rts"))
    l.join(r, Seq("_k"))
      .filter(col("_rts") >= col("_lts") &&
        col("_rts") < col("_lts") + windowMicros)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Exact interpolated percentiles (sort-based, distributed). */
  def percentiles(df: DataFrame, key: Column, value: Column,
                  ps: Seq[(String, Double)]): DataFrame = {
    val aggs = ps.map { case (name, p) =>
      round4(percentile(value, lit(p))).as(name)
    }
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** B7b: SCALE-SAFE percentiles — `approx_percentile` (Spark's
    * Greenwald-Khanna summary) in the same output shape as
    * [[percentiles]]. The exact variant buffers a per-group
    * value-count map, so its memory is O(distinct values per group) —
    * fine until one group's domain outgrows an executor; this one
    * holds a bounded ~O(accuracy) summary per group and merges in
    * partial aggregation, so it survives any group size. Guarantee:
    * the returned value's RANK is within n/accuracy of the true
    * percentile rank (spec-bounded against the exact path). Sketch
    * result — gated rows-only, like the HLL reduces (A21/B23). */
  def approxPercentiles(df: DataFrame, key: Column, value: Column,
                        ps: Seq[(String, Double)],
                        accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map { case (name, p) =>
      round4(approx_percentile(value, lit(p), lit(accuracy))).as(name)
    }
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** Pivot with a FIXED value list: keeps the output schema static (no
    * extra driver-side distinct scan) — mandatory at 100 TB. */
  def pivotCount(df: DataFrame, rowKey: String, pivotCol: String,
                 values: Seq[String]): DataFrame =
    df.groupBy(col(rowKey)).pivot(pivotCol, values).agg(count(lit(1)))
      .select(col(rowKey) +: values.map(v =>
        coalesce(col(s"`$v`"), lit(0L))
          .as(s"n_${v.replaceAll("[^A-Za-z0-9]", "_")}")): _*)

  /** Skew-safe two-phase aggregation: pre-aggregate on (key, salt), then
    * combine partials per key. A hot key's rows spread over `salt`
    * distinct reducers in phase 1, so no single task absorbs the whole
    * key — the standard defense when one view key dominates (decimal
    * partials keep the result exactly equal to a direct groupBy sum). */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salt: Column): DataFrame =
    df.groupBy(key.as("key"), salt.as("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("sum_value"))

  /** Skew-safe salted JOIN — the companion of [[saltedSum]] for joins:
    * the BIG side's rows get a pseudo-random salt in [0, salts) and
    * the SMALL side is replicated once per salt value, so one hot join
    * key's probe rows spread over `salts` reducers instead of one task
    * absorbing the whole key. The join RESULT is salt-independent
    * (every big row still meets every matching small row exactly once),
    * which is what the oracle gate checks; only the row distribution
    * changes. The salt hashes the big row's OWN columns — a
    * DETERMINISTIC expression, so a retried map task re-salts rows
    * identically (salting via `rand()`/`monotonically_increasing_id()`
    * makes the stage indeterminate: a shuffle-fetch failure then forces
    * whole-stage rollback, in the very large-shuffle environment this
    * operator targets). Fully duplicate rows share a salt — the spread
    * keys on row CONTENT diversity, which skewed real keys have.
    * `saltCols` names the columns the salt hashes (default: ALL of the
    * big side's columns) — on a wide fact table pass the key plus a
    * high-cardinality discriminator (line number, timestamp) so each
    * probe row hashes a few cells, not fifty.
    * Cost: the small side shuffles `salts`× — size it so
    * replicated-small ≪ big (the precondition for salting to pay). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, saltCols: Seq[Column] = Nil): DataFrame = {
    require(salts >= 2, "salts must be >= 2 (1 is a plain join)")
    // the working column must not collide with (and silently clobber)
    // a real column of either input
    val sc = Iterator.from(0).map(i => s"_salt$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val src = if (saltCols.nonEmpty) saltCols
              else big.columns.map(col).toIndexedSeq
    val b = big.withColumn(sc,
      pmod(xxhash64(src: _*), lit(salts.toLong)).cast("int"))
    val s = small.withColumn(sc,
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, sc)).drop(sc)
  }

  /** Keep the latest row per key by a time ordering (the reference's
    * "current revision wins" read semantics, batch form). */
  def latestByKey(df: DataFrame, key: Column, order: Seq[Column]): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(key).orderBy(order.map(_.desc): _*)))
      .filter(col("_rn") === 1).drop("_rn")

  /** Exact global row numbers WITHOUT a single-partition window: range-
    * partition by the ordering, sort within partitions, then add each
    * partition's offset (computed from a cheap counting pass) — the
    * two-phase formulation that keeps total ordering distributed. A
    * global `Window.orderBy` pulls the whole dataset through ONE task;
    * this scales with the cluster. `order` must be a total order
    * (include a unique tie-break column) or ranks at partition
    * boundaries are nondeterministic. The one `mapPartitionsWithIndex`
    * in the codebase — per-partition imperative offset assignment is
    * exactly the case the RDD escape hatch exists for. Returns the
    * input columns plus `out` (1-based rank) and leaves the data sorted.
    */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
                          out: String = "rank"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // two passes follow (count, then rank); both re-execute this sort.
    // Deliberately NOT persisted: a cached copy would stay pinned in the
    // block manager for the session (no safe point to unpersist a lazily
    // consumed result), and determinism is already guaranteed by the
    // total order, so both passes see identical partitions.
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val ranked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Exact per-stratum quota sampling — the train/val split primitive
    * a corpus pipeline needs: from every stratum (language, source,
    * domain …) keep exactly `floor(count * num / den)` rows, chosen by
    * a deterministic portable hash order (md5 of the id), so the
    * sample is reproducible across engines and runs.
    *
    * Scale-safe formulation: ONE global two-phase rank ordered by
    * (stratum, hash, id) — [[withGlobalRowNumber]], so each stratum
    * spans many partitions; no per-stratum single-partition window —
    * then per-stratum offsets/counts (one tiny aggregate, broadcast
    * back) convert the global rank to a within-stratum rank. The
    * quota test `(rank * den <= count * num)` is pure integer math —
    * no float fraction boundary to diverge on. */
  def stratifiedSampleExact(df: DataFrame, stratum: Column, id: Column,
                            num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0, "quota must be num/den with den > 0")
    val withH = df.withColumn("_strat", stratum)
      .withColumn("_h", md5(id.cast("string").cast("binary")))
    val ranked = withGlobalRowNumber(withH,
      Seq(col("_strat"), col("_h"), id), "_gr")
    val offs = ranked.groupBy(col("_strat"))
      .agg(min(col("_gr")).as("_off"), count(lit(1)).as("_cnt"))
    ranked.join(broadcast(offs), Seq("_strat"))
      .filter((col("_gr") - col("_off") + lit(1L)) * den <=
        col("_cnt") * num)
      .drop("_strat", "_h", "_gr", "_off", "_cnt")
  }

  /** DOMAIN MIXING — the corpus-reweighting step of a training-data
    * pipeline: each domain (source, language, crawl, …) is downsampled
    * to its own EXACT rational rate `num/den` (e.g. keep 1/2 of web,
    * all of books), unlisted domains to `default`. Deterministic and
    * exact: rows rank within their domain by the md5 of their id (a
    * stable pseudo-random order both engines compute identically —
    * the [[stratifiedSampleExact]] construction), and the first
    * `floor(cnt·num/den)` survive, so the realized mix matches the
    * requested proportions to ±1 row per domain — no Bernoulli
    * variance, retry-stable.
    *
    * Scale: one range-shuffle for the global rank, per-domain
    * count/offset frames broadcast (domain cardinality is small by
    * definition), rates joined as a broadcast literal frame. No
    * driver-side data movement beyond per-partition counts. */
  def mixDomains(df: DataFrame, domain: Column, id: Column,
                 rates: Map[String, (Int, Int)],
                 default: (Int, Int) = (1, 1)): DataFrame = {
    require((rates.values.toSeq :+ default).forall {
      case (n, d) => n >= 0 && d > 0
    }, "every rate must be num/den with den > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val withH = df.withColumn("_strat", domain.cast("string"))
      .withColumn("_h", md5(id.cast("string").cast("binary")))
    val ranked = withGlobalRowNumber(withH,
      Seq(col("_strat"), col("_h"), id), "_gr")
    val offs = ranked.groupBy(col("_strat"))
      .agg(min(col("_gr")).as("_off"), count(lit(1)).as("_cnt"))
    val rdf = rates.toSeq.map { case (k, (n, d)) => (k, n.toLong, d.toLong) }
      .toDF("_strat", "_num", "_den")
    ranked.join(broadcast(offs), Seq("_strat"))
      .join(broadcast(rdf), Seq("_strat"), "left")
      .filter((col("_gr") - col("_off") + lit(1L)) *
        coalesce(col("_den"), lit(default._2.toLong)) <=
        col("_cnt") * coalesce(col("_num"), lit(default._1.toLong)))
      .drop("_strat", "_h", "_gr", "_off", "_cnt", "_num", "_den")
  }

  /** TEMPERATURE-SCALED domain mixing — the corpus-balancing sampler
    * multilingual / multi-source training sets are built with: instead
    * of caller-supplied per-domain rates ([[mixDomains]]), each
    * domain's share of a fixed row `budget` derives from its SIZE
    * raised to a temperature `α < 1` (rare domains upweighted, huge
    * domains flattened — the mT5/XLM-R sampling rule). The weight
    * stays in INTEGER space — `w_d = weightOf(n_d)`, default
    * `floor(sqrt(n_d))` (α = 0.5) — so the split
    * `target_d = budget·w_d div Σw` is exact integer arithmetic,
    * reproducible across engines (no float pow boundary to diverge
    * on); rows are kept by each domain's deterministic md5-rank
    * prefix, the [[stratifiedSampleExact]] discipline.
    *
    * Scale shape: one global two-phase range-partitioned rank (no
    * single-partition window), one tiny per-domain aggregate
    * broadcast back, one one-row weight-sum broadcast. A domain
    * smaller than its target keeps all its rows (temperature can
    * only flatten here, not replicate — compose [[upsampleDomains]]
    * for fractional epochs above 1). */
  def temperatureMix(df: DataFrame, domain: Column, id: Column,
                     budget: Long,
                     weightOf: Column => Column = c =>
                       floor(sqrt(c)).cast("long")): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val withH = df.withColumn("_strat", domain.cast("string"))
      .withColumn("_h", md5(id.cast("string").cast("binary")))
    val ranked = withGlobalRowNumber(withH,
      Seq(col("_strat"), col("_h"), id), "_gr")
    val offs = ranked.groupBy(col("_strat"))
      .agg(min(col("_gr")).as("_off"), count(lit(1)).as("_cnt"))
      .withColumn("_w", weightOf(col("_cnt")))
    val wsum = offs.agg(sum(col("_w")).as("_wsum"))
    // try_multiply nulls on Long overflow in ANY ANSI mode; an extreme
    // budget×weight then fails LOUDLY instead of wrapping into a
    // silently corrupted split.
    ranked.join(broadcast(offs), Seq("_strat"))
      .crossJoin(broadcast(wsum))
      .withColumn("_prod", coalesce(expr(s"try_multiply(${budget}L, _w)"),
        raise_error(lit("temperatureMix: budget*weight overflows Long — " +
          "rescale weightOf")).cast("long")))
      .filter(col("_gr") - col("_off") + lit(1L) <= expr("_prod div _wsum"))
      .drop("_strat", "_h", "_gr", "_off", "_cnt", "_w", "_wsum", "_prod")
  }

  /** Deterministic EPOCH SHUFFLE — the global training-order
    * permutation: every row ranked by a portable keyed hash
    * `md5(seed:id)` (ties broken by id), a DIFFERENT permutation per
    * epoch seed, the SAME permutation on every rerun and every
    * engine. Returns the input plus a 1-based `pos` column.
    *
    * This is the operator a trainer composes BEFORE
    * [[graft.operators.Text.packSequences]]-style packing: shuffle
    * positions decide packing neighborhoods, so the whole
    * shuffle→pack pipeline is reproducible from (corpus, seed). Scale
    * shape: [[withGlobalRowNumber]]'s two-phase range-partitioned
    * rank — one hash projection, one range exchange; no
    * single-partition window, no driver-side permutation table. */
  def epochShuffle(df: DataFrame, id: Column, seed: String): DataFrame =
    withGlobalRowNumber(
      df.withColumn("_h",
        md5(concat(lit(seed), lit(":"), id.cast("string"))
          .cast("binary"))),
      Seq(col("_h"), id), "pos")
      .drop("_h")

  /** DOMAIN UPSAMPLING — the fractional-EPOCH generalization of
    * [[mixDomains]]: a domain's rational rate `num/den` may exceed 1
    * (e.g. 5/2 = replicate wiki 2.5×, the Pile/LLaMA-style epoch
    * weighting). Every row gets `num div den` base copies; the first
    * `floor(cnt·(num mod den)/den)` rows of the domain's deterministic
    * md5 rank get one extra, so the domain's total is EXACTLY
    * `floor(cnt·num/den)` — rates below 1 degenerate to [[mixDomains]]'s
    * downsampling cut (base 0, extras only). Output repeats each kept
    * row with a `copy` index `0..copies-1` (the trainer's shuffle can
    * hash on (id, copy)).
    *
    * Scale: the mixDomains rank machinery plus one BOUNDED explode
    * (`num div den + 1` rows max per input row) — no join against a
    * generated series, no driver state. */
  def upsampleDomains(df: DataFrame, domain: Column, id: Column,
                      rates: Map[String, (Int, Int)],
                      default: (Int, Int) = (1, 1)): DataFrame = {
    require((rates.values.toSeq :+ default).forall {
      case (n, d) => n >= 0 && d > 0
    }, "every rate must be num/den with den > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val withH = df.withColumn("_strat", domain.cast("string"))
      .withColumn("_h", md5(id.cast("string").cast("binary")))
    val ranked = withGlobalRowNumber(withH,
      Seq(col("_strat"), col("_h"), id), "_gr")
    val offs = ranked.groupBy(col("_strat"))
      .agg(min(col("_gr")).as("_off"), count(lit(1)).as("_cnt"))
    val rdf = rates.toSeq.map { case (k, (n, d)) => (k, n.toLong, d.toLong) }
      .toDF("_strat", "_num", "_den")
    ranked.join(broadcast(offs), Seq("_strat"))
      .join(broadcast(rdf), Seq("_strat"), "left")
      .withColumn("_nm", coalesce(col("_num"), lit(default._1.toLong)))
      .withColumn("_dn", coalesce(col("_den"), lit(default._2.toLong)))
      .withColumn("_pos", col("_gr") - col("_off") + lit(1L))
      .withColumn("_copies", expr("_nm div _dn") +
        when(col("_pos") * col("_dn") <=
          col("_cnt") * pmod(col("_nm"), col("_dn")), 1L).otherwise(0L))
      .filter(col("_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_strat", "_h", "_gr", "_off", "_cnt", "_num", "_den",
        "_nm", "_dn", "_pos", "_copies")
  }

  /** Equi-width histogram via integral bucket arithmetic. */
  def histogram(df: DataFrame, value: Column, width: Double): DataFrame =
    df.groupBy(floor(value / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact global EXCLUSIVE prefix sum of `value` in `order` — the
    * running-total sibling of [[withGlobalRowNumber]], and the same
    * two-phase shape: range-partition on the ordering, one cheap
    * per-partition totals pass (a `collect` of ONE long per partition),
    * then a compiled in-partition running add starting from the
    * partition's offset. A `sum(...).over(Window.orderBy(...))` would
    * drag the whole dataset through a single task; this scales with
    * the cluster. `order` must be a total order (unique tie-break) and
    * `value` non-null. Returns the input columns plus `out` = sum of
    * `value` over all STRICTLY PRECEDING rows (0 for the first). */
  def withGlobalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                          out: String = "cum_before"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("_psv", value.cast(LongType))
    // not persisted for the same reason as withGlobalRowNumber: the
    // total order makes both passes see identical partitions.
    val sorted = withV.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = sorted.schema.fieldIndex("_psv")
    val sums = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val cum = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = offsets(i)
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ s); s += row.getLong(vIdx); r
      }
    }
    spark.createDataFrame(cum, schema).drop("_psv")
  }

  /** TOKEN-BALANCED SHARDING — the corpus-layout step before training:
    * assign every document to a numbered output shard such that shards
    * hold ~`budget` tokens each, documents never split, and the
    * assignment is deterministic across engines and runs. Order is the
    * md5-of-id pseudo-random permutation (the [[stratifiedSampleExact]]
    * convention) so shards are topic-decorrelated without a true
    * shuffle; a doc lands in `shard = floor(cum_before / budget)`
    * where `cum_before` is the EXACT global token prefix sum — i.e. a
    * shard closes at the first doc that starts past its budget
    * boundary (overflow bounded by one document).
    *
    * Returns `(doc_id, n_tokens, cum_before, shard)`; downstream
    * writers `repartition(col("shard"))` and get size-balanced files.
    *
    * Scale: ONE range shuffle (the prefix-sum machinery) + arithmetic;
    * driver traffic is one long per partition. The window-function
    * formulation (`SUM OVER (ORDER BY …)`) is the 1-task trap this
    * avoids — that's left to the oracle, which can afford it at test
    * scale. */
  def shardByTokenBudget(df: DataFrame, id: Column, tokens: Column,
                         budget: Long): DataFrame = {
    require(budget > 0, s"shard token budget must be positive, got $budget")
    val base = df.select(id.cast("long").as("doc_id"),
      tokens.cast("long").as("n_tokens"))
      .withColumn("_h", md5(col("doc_id").cast("string").cast("binary")))
    withGlobalPrefixSum(base, Seq(col("_h"), col("doc_id")),
      col("n_tokens"), "cum_before")
      .withColumn("shard", expr(s"cum_before div ${budget}L"))
      .select(col("doc_id"), col("n_tokens"), col("cum_before"),
        col("shard"))
  }

  /** WEIGHTED sampling WITHOUT replacement, deterministic — the
    * Efraimidis–Spirakis (2006) A-Res scheme with its randomness
    * replaced by the engine's portable md5-of-(seed:id) uniform: row
    * i gets key `ln(uᵢ)/wᵢ` (the log form of ranking by uᵢ^(1/wᵢ)),
    * and the sample is the global top-n keys — inclusion odds follow
    * the weights exactly as A-Res proves, a doubled weight ≈ doubled
    * keep probability, and the same (corpus, seed, n) yields the
    * same sample on every engine and every rerun (the pipeline use:
    * w = quality score, n = the token budget's row count — the
    * quality-weighted corpus subsample between uniform sampling and
    * hard top-n-by-quality, which would throw away all diversity).
    * u reads the md5's first 13 hex digits as a 52-bit integer (every
    * double op exact), so the oracle replays it digit for digit.
    * One projection + one global TakeOrdered (partitions ship only
    * their local top n — no full sort, no window); weights must be
    * strictly positive, loudly. */
  def weightedSampleExact(df: DataFrame, id: Column, weight: Column,
                          n: Int, seed: String = ""): DataFrame = {
    require(n >= 0, "n must be non-negative")
    val v = conv(substring(md5(concat(lit(seed), lit(":"),
      id.cast("string")).cast("binary")), 1, 13), 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(4503599627370496.0)
    val w = weight.cast("double")
    val guarded = coalesce(when(w > 0, w),
      raise_error(lit("weightedSampleExact: weights must be strictly " +
        "positive")).cast("double"))
    df.withColumn("_wskey", log(u) / guarded)
      .orderBy(col("_wskey").desc, id)
      .limit(n)
      .drop("_wskey")
  }
}
