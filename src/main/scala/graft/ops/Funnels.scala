package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ordered-funnel and cohort-retention analytics over an event table
 * (extensions beyond the reference: the standard product-analytics
 * operators an event pipeline needs, shaped for scale).
 */
object Funnels {

  /**
   * Per-key ordered funnel: for the given sequence of `steps` event
   * types, the timestamp at which each step was FIRST completed,
   * where step i+1 must occur STRICTLY after the completion of step
   * i. Columns are null from the first incomplete step onward. Every
   * key with at least one step-typed event appears in the output.
   *
   * Scale shape: events are filtered to the step types BEFORE the
   * per-key collect (only those rows can matter), then ONE shuffle on
   * the key; the chain itself is a codegen'd higher-order fold over
   * the sorted per-key event list — no window, no K self-joins (the
   * naive formulation shuffles K times). The per-key list is HARD-BOUNDED
   * by `maxEventsPerKey` (earliest events win — exact whenever the
   * cap isn't hit; see the pre-cap note below), so one robot key
   * can't OOM an executor.
   */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxEventsPerKey: Int = 1000000): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxEventsPerKey >= 1, "maxEventsPerKey must be positive")
    val k = steps.length
    val stepArr = array(steps.map(lit): _*)
    // state: k nullable timestamps, slot i = completion ts of step i
    val init = array((0 until k).map(_ => lit(null).cast("timestamp")): _*)
    val evs = sort_array(collect_list(struct(col("_ts").as("ts"), col("_tp").as("tp"))))
    val folded = aggregate(evs, init, (st, e) => {
      val done = size(filter(st, x => x.isNotNull))
      // completion ts of the last finished step. greatest/least keep
      // both lookups in-bounds (ANSI element_at throws on
      // out-of-range even for rows a conjunct rejects). For the first
      // step (done==0) the strictly-after guard is `done===0 OR
      // ts > null` — TRUE OR NULL is TRUE in three-valued logic, so
      // no epoch-floor sentinel is needed (and pre-1900 timestamps
      // can't break eligibility).
      val prevTs = element_at(st, greatest(done, lit(1)))
      val eligible = (done < lit(k)) &&
        (element_at(stepArr, least(done + lit(1), lit(k))) === e("tp")) &&
        ((done === lit(0)) || (e("ts") > prevTs))
      when(eligible,
        transform(st, (x, i) => when(i === done, e("ts")).otherwise(x)))
        .otherwise(st)
    })
    val stepCols: Seq[Column] = steps.zipWithIndex.map { case (s, i) =>
      element_at(col("_steps"), i + 1).as(s"${s}_ts")
    }
    // Pre-cap per-key history: one pathological key (a robot user with
    // 10^8 step-typed events) would otherwise OOM an executor at the
    // collect_list. Keeping the EARLIEST maxEventsPerKey events is
    // WindowGroupLimit-shaped (per-partition top-k heaps before the
    // exchange, no full per-key sort materialized) and exact whenever
    // the cap isn't hit — first-completion funnels only ever advance on
    // the earliest eligible events. The rank window shuffles on the
    // same key as the groupBy, so the agg reuses that partitioning:
    // still ONE event-volume shuffle.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_ts").asc, col("_tp").asc)
    df.filter(col(typeCol).isin(steps: _*))
      .select(col(keyCol), col(tsCol).as("_ts"), col(typeCol).as("_tp"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxEventsPerKey)
      .drop("_rn")
      .groupBy(col(keyCol))
      .agg(folded.as("_steps"))
      .select(col(keyCol) +: stepCols: _*)
  }

  /**
   * Per-key Markov transition counts: for events ordered by
   * (ts, tiebreak) within each key, the count of each observed
   * (prev_type -> next_type) transition plus its conditional
   * probability in integer micros (`n * 1e6 div n_from` — integral
   * division, exact and identical cross-engine; no FP).
   *
   * Scale shape: ONE event-volume shuffle (the lag window on the key);
   * the transition matrix aggregate is |types|^2 — tiny — so the
   * closing groupBy and the per-prev_type normalizing window cost
   * nothing. The naive per-pair self-join form shuffles event volume
   * twice.
   */
  def eventTransitions(df: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, tiebreak: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy((col(tsCol) +: tiebreak.map(col)): _*)
    val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("prev_type"))
    df.select(col(keyCol) +: col(tsCol) +: col(typeCol) +: tiebreak.map(col): _*)
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_from_total", sum(col("n")).over(wp))
      .withColumn("p_micro", expr("(n * CAST(1000000 AS BIGINT)) div _from_total"))
      .drop("_from_total")
  }

  /**
   * Daily event-rate spike detection with an EXACT integer z-test: per
   * (type, day) counts, a day is anomalous when |c - mean| > z*sigma
   * over that type's observed days. The test is evaluated without any
   * floating point — with n days, S = sum(c), Q = sum(c^2), the
   * condition |c - S/n| > z * sqrt((nQ - S^2)/n^2) squares to
   * (n*c - S)^2 > z^2 * (nQ - S^2), all integer arithmetic in
   * DECIMAL(38,0) (a plain Int64 c^2 wraps past c ~ 3e9 daily events
   * — a real rate at 100 TB — while DuckDB's HUGEINT doesn't; decimal
   * keeps both engines exact to c ~ 1e15).
   *
   * Scale shape: ONE event-volume shuffle (the daily pre-aggregation,
   * map-side combined); the per-type stats window runs over
   * types × days rows — tiny. Population variance; a type observed on
   * a single day has zero variance and never flags.
   */
  def rateAnomalies(df: DataFrame, typeCol: String, tsCol: String,
                    z: Int = 2): DataFrame = {
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val dev = d38(col("_nd")) * d38(col("n")) - d38(col("_s"))
    df.groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_nd", count(lit(1)).over(wt))
      .withColumn("_s", sum(col("n")).over(wt))
      .withColumn("_q", sum(d38(col("n")) * d38(col("n"))).over(wt))
      .withColumn("mean_micro",
        expr("CAST(CAST(_s AS DECIMAL(38,0)) * 1000000 div _nd AS BIGINT)"))
      .withColumn("is_anomaly",
        dev * dev > lit(z.toLong * z) * (d38(col("_nd")) * col("_q") - d38(col("_s")) * d38(col("_s"))))
      .select(col("event_type"), date_format(col("_d"), "yyyy-MM-dd").as("day"),
        col("n"), col("mean_micro"), col("is_anomaly"))
  }

  /**
   * Seasonal (day-of-week × hour) rate anomalies: each observed
   * (type, date, hour) cell is z-tested against its OWN seasonal
   * population — all cells of the same (type, weekday, hour) slot —
   * with the same exact integer algebra as [[rateAnomalies]]
   * ((n·N − S)² > z²(N·Q − S²) in DECIMAL(38,0); no FP, verdicts
   * hash-identical cross-engine). This is the "is 3pm-on-Monday
   * unusual *for a Monday 3pm*" report that a flat daily baseline
   * can't express. Hours nobody logged are absent rows (observed-cell
   * population, [[rateAnomalies]]' stance — an explicit calendar
   * spine join would impute zeros; compose one upstream if silence
   * itself is the anomaly). One event-volume shuffle (the hourly
   * pre-agg); the stats windows run on the tiny cell relation.
   */
  def seasonalAnomalies(df: DataFrame, typeCol: String, tsCol: String,
                        z: Int = 2): DataFrame = {
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("dow"), col("hour"))
    val dev = d38(col("_nd")) * d38(col("n")) - d38(col("_s"))
    df.groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"),
        dayofweek(col(tsCol)).as("dow"), hour(col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_nd", count(lit(1)).over(wt))
      .withColumn("_s", sum(col("n")).over(wt))
      .withColumn("_q", sum(d38(col("n")) * d38(col("n"))).over(wt))
      .withColumn("mean_micro",
        expr("CAST(CAST(_s AS DECIMAL(38,0)) * 1000000 div _nd AS BIGINT)"))
      .withColumn("is_anomaly",
        dev * dev > lit(z.toLong * z) * (d38(col("_nd")) * col("_q") - d38(col("_s")) * d38(col("_s"))))
      .select(col("event_type"), date_format(col("_d"), "yyyy-MM-dd").as("day"),
        col("dow"), col("hour"), col("n"), col("mean_micro"), col("is_anomaly"))
  }

  /**
   * Time-to-convert statistics per consecutive funnel step pair:
   * completions, mean latency in integral micros of a second
   * (`sum * 1e6 div n` — order-independent integer math, exact
   * cross-engine), min and max seconds. Built ON the funnel output,
   * so it inherits funnel's one-shuffle shape; the per-pair explode
   * and the closing (steps-1)-row aggregate are free by comparison.
   * Latencies are floor-of-epoch second diffs (strictly-after
   * semantics makes them non-negative); step pairs nobody completed
   * are absent from the output.
   */
  def funnelLatency(df: DataFrame, keyCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    maxEventsPerKey: Int = 1000000): DataFrame = {
    require(steps.length >= 2, "funnelLatency needs at least two steps")
    val f = funnel(df, keyCol, tsCol, typeCol, steps, maxEventsPerKey)
    val lat = explode(array(steps.zip(steps.tail).map { case (a, b) =>
      struct(lit(a).as("f"), lit(b).as("t"),
        (unix_timestamp(col(s"${b}_ts")) - unix_timestamp(col(s"${a}_ts"))).as("secs"))
    }: _*)).as("p")
    f.select(lat)
      .select(col("p.f").as("step_from"), col("p.t").as("step_to"),
        col("p.secs").as("secs"))
      .filter(col("secs").isNotNull)
      .groupBy(col("step_from"), col("step_to"))
      .agg(count(lit(1)).as("n_converted"),
        expr("sum(secs) * CAST(1000000 AS BIGINT) div count(1)").as("mean_secs_micro"),
        min(col("secs")).as("min_secs"), max(col("secs")).as("max_secs"))
  }

  /**
   * Marketing-touch attribution: each conversion event's value is
   * credited to the LAST (or FIRST) touch-typed event strictly before
   * it in the key's (ts, tiebreak) order; conversions with no prior
   * touch land in the 'none' channel. Output: per-channel conversion
   * count + decimal-exact attributed value.
   *
   * Scale shape: the isin(touch ∪ conversion) filter reaches the scan
   * (only those rows can matter), then ONE event-volume shuffle — the
   * per-key window whose running first/last(ignoreNulls) carries the
   * touch forward; the closing aggregate is |channels| rows. The
   * rows-preceding frame (not range) makes same-timestamp ordering
   * the tiebreak's decision, deterministically.
   */
  def attribution(df: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, valueCol: String,
                  conversionType: String, touchTypes: Seq[String],
                  tiebreak: Seq[String], firstTouch: Boolean = false): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy((col(tsCol) +: tiebreak.map(col)): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*), col(typeCol))
    val carried = if (firstTouch) first(touch, ignoreNulls = true).over(w)
                  else last(touch, ignoreNulls = true).over(w)
    df.filter(col(typeCol).isin((touchTypes :+ conversionType): _*))
      .select(col(keyCol) +: col(tsCol) +: col(typeCol) +: col(valueCol) +: tiebreak.map(col): _*)
      .withColumn("_ch", carried)
      .filter(col(typeCol) === conversionType)
      .groupBy(coalesce(col("_ch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("attributed_value"))
  }

  /**
   * Rolling (trailing k-day) mean and outlier bands over daily event
   * counts per type: the windowed cousin of [[rateAnomalies]] — the
   * same exact integer z-test ((n·W − S)² > z²(W·Q − S²), DECIMAL(38)
   * throughout) evaluated against the TRAILING window's own
   * population instead of the whole history, so a level shift stops
   * polluting the baseline after k days. `n_window` counts the rows
   * actually in the frame (the first k−1 days run on a shorter
   * window, standard rolling semantics — gate on n_window == k
   * downstream if warm-up rows should not alert). One event-volume
   * shuffle (daily pre-agg); the rolling windows ride the small
   * per-type day relation.
   */
  def rollingBands(df: DataFrame, typeCol: String, tsCol: String,
                   k: Int = 7, z: Int = 2): DataFrame = {
    require(k >= 2, "k must be >= 2")
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("_d"))
      .rowsBetween(-(k - 1), 0)
    val dev = d38(col("_nw")) * d38(col("n")) - d38(col("_s"))
    df.groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_nw", count(lit(1)).over(w))
      .withColumn("_s", sum(col("n")).over(w))
      .withColumn("_q", sum(d38(col("n")) * d38(col("n"))).over(w))
      .withColumn("mean_micro",
        expr("CAST(CAST(_s AS DECIMAL(38,0)) * 1000000 div _nw AS BIGINT)"))
      .withColumn("is_outlier",
        dev * dev > lit(z.toLong * z) *
          (d38(col("_nw")) * col("_q") - d38(col("_s")) * d38(col("_s"))))
      .select(col("event_type"), date_format(col("_d"), "yyyy-MM-dd").as("day"),
        col("n"), col("_nw").as("n_window"), col("mean_micro"), col("is_outlier"))
  }

  /**
   * Funnel drop-off report: one row per step with how many keys
   * reached it, the share of step-1 entrants still alive
   * (reach_micro), and the step-over-step conversion (conv_micro) —
   * both integral micros over the exact step counts of [[funnel]]
   * (whose one-shuffle shape this inherits; the closing explode runs
   * on a 1-row aggregate). Step 1's conv is NULL (no previous step).
   */
  def funnelDropoff(df: DataFrame, keyCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    maxEventsPerKey: Int = 1000000): DataFrame = {
    val f = funnel(df, keyCol, tsCol, typeCol, steps, maxEventsPerKey)
    val aggs = steps.map(s =>
      sum(col(s"${s}_ts").isNotNull.cast("long")).as(s"_n_$s"))
    val one = f.agg(aggs.head, aggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      val n = col(s"_n_$s")
      val first = col(s"_n_${steps.head}")
      val reach = when(first > 0, expr(s"_n_$s * 1000000 div _n_${steps.head}"))
      val conv =
        if (i == 0) lit(null).cast("long")
        else when(col(s"_n_${steps(i - 1)}") > 0,
          expr(s"_n_$s * 1000000 div _n_${steps(i - 1)}"))
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"), n.as("n_reached"),
        reach.as("reach_micro"), conv.as("conv_micro"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /**
   * Per-key inter-event gap histogram in log2 buckets: consecutive
   * events of the same key, gap in whole seconds, bucket = bit length
   * of the gap (`length(bin(gap))` — integer-exact where FP log2
   * flips at powers of two; gap 0 shares bucket 1 with gap 1). The
   * cadence fingerprint that separates humans from robots. One key
   * shuffle (lag window), map-side-combined bucket agg.
   */
  def gapHistogram(df: DataFrame, keyCol: String, tsCol: String,
                   tiebreak: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreak))
    val ep = floor(unix_timestamp(col(tsCol))).cast("long")
    df.withColumn("_gap", ep - lag(ep, 1).over(w))
      .filter(col("_gap").isNotNull)
      .groupBy(length(bin(col("_gap"))).as("gap_bits"))
      .agg(count(lit(1)).as("n"),
        min(col("_gap")).as("min_gap_secs"), max(col("_gap")).as("max_gap_secs"))
  }

  /**
   * Burstiness index per key over inter-event gaps (Goh & Barabási
   * 2008): B = (σ−μ)/(σ+μ) of the gap distribution — B→−1 for
   * metronomic (robot) cadence, ≈0 for Poisson, →+1 for bursty human
   * behavior; the statistical sibling of [[gapHistogram]]'s visual.
   * μ and σ (population) come from exact integer moment sums over
   * whole-second gaps; B is a stated IEEE closing tree. Keys with <
   * `minGaps` gaps are dropped (no distribution to speak of); a
   * constant gap yields exactly −1. One key shuffle (lag window +
   * map-side-combined agg on the same key).
   */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String,
                 tiebreak: String, minGaps: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreak))
    val ep = floor(unix_timestamp(col(tsCol))).cast("long")
    val agg = df.withColumn("_gap", ep - lag(ep, 1).over(w))
      .filter(col("_gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("_gap")).as("_s"),
        sum(col("_gap").cast("decimal(38,0)") * col("_gap")).as("_q"))
      .filter(col("n_gaps") >= minGaps)
    val nD = col("n_gaps").cast("double")
    val mean = col("_s").cast("double") / nD
    val sd = sqrt((nD * col("_q").cast("double") -
      col("_s").cast("double") * col("_s").cast("double")) / (nD * nD))
    agg
      .withColumn("mean_gap", mean)
      .withColumn("sd_gap", sd)
      .withColumn("burstiness",
        when(col("sd_gap") + col("mean_gap") > 0,
          (col("sd_gap") - col("mean_gap")) / (col("sd_gap") + col("mean_gap"))))
      .select(col(keyCol), col("n_gaps"), col("mean_gap"), col("sd_gap"),
        col("burstiness"))
  }

  /**
   * LINEAR (multi-touch) attribution: every touch strictly before a
   * conversion shares the conversion's credit equally, in EXACT
   * integral micros — base = 10⁶ div k per touch, and the
   * 10⁶ mod k remainder goes one micro apiece to the EARLIEST
   * touches (largest-remainder style), so each conversion's credit
   * sums to exactly 10⁶ and the split is deterministic. Conversions
   * with no prior touch credit 'none'. Completes the attribution
   * family: [[attribution]] is the single-touch (first/last) form.
   *
   * Scale shape: conversions join touches per KEY (one co-partitioned
   * equi join + row-local ts filter), so per-key work is
   * touches×conversions — `maxEventsPerKey` drops hyperactive keys
   * whole (the funnel operator's valve). Credit ranks ride a window
   * keyed by conversion.
   */
  def linearAttribution(df: DataFrame, keyCol: String, tsCol: String,
                        typeCol: String, conversionType: String,
                        touchTypes: Seq[String], tiebreak: String,
                        maxEventsPerKey: Int = 100000): DataFrame = {
    require(touchTypes.nonEmpty, "linearAttribution needs at least one touch type")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    val wk = org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))
    val base = df.filter(col(typeCol).isin((touchTypes :+ conversionType): _*))
      .select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
        col(typeCol).as("_ty"), col(tiebreak).as("_tb"))
      .withColumn("_nk", count(lit(1)).over(wk))
      .filter(col("_nk") <= maxEventsPerKey)
    val convs = base.filter(col("_ty") === conversionType)
      .select(col("_k"), col("_ts").as("_cts"), col("_tb").as("_ctb"))
    val touches = base.filter(col("_ty").isin(touchTypes: _*))
      .select(col("_k"), col("_ts").as("_tts"), col("_tb").as("_ttb"),
        col("_ty").as("channel"))
    val pairs = convs.join(touches, Seq("_k"))
      .filter(col("_tts") < col("_cts") ||
        (col("_tts") === col("_cts") && col("_ttb") < col("_ctb")))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k"), col("_cts"), col("_ctb"))
    val wr = wc.orderBy(col("_tts").asc, col("_ttb").asc)
    val credited = pairs
      .withColumn("_kcnt", count(lit(1)).over(wc))
      .withColumn("_rn", row_number().over(wr))
      .withColumn("credit_micro",
        expr("1000000 div _kcnt") +
          when(col("_rn") <= expr("1000000 % _kcnt"), 1L).otherwise(0L))
    val touched = credited.groupBy(col("channel"))
      .agg(sum(col("credit_micro")).as("credit_micro"),
        count_distinct(col("_k"), col("_cts"), col("_ctb")).as("n_conversions_touched"))
    val untouched = convs.join(pairs.select(col("_k"), col("_cts"), col("_ctb")).distinct(),
        Seq("_k", "_cts", "_ctb"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 0)
      .select(lit("none").as("channel"), (col("n") * lit(1000000L)).as("credit_micro"),
        col("n").as("n_conversions_touched"))
    touched.unionAll(untouched)
  }

  /**
   * Cohort retention matrix: keys grouped by first-active day; for
   * each (cohort_day, day_offset <= maxOffsetDays) the number of
   * cohort keys active on that day. `cohort_day` is formatted
   * yyyy-MM-dd (string: engine-portable, sorts correctly).
   *
   * Scale shape: ONE event-volume shuffle — a per-key collect_set of
   * active days (map-side combining; the per-key set is bounded by
   * the calendar, not by event count). First day and offsets are then
   * row-local (array_min + explode), and the closing matrix aggregate
   * is tiny (days × offsets). The naive distinct-then-join form
   * shuffles event volume twice more.
   */
  /**
   * Cohort LTV curve — [[retention]]'s monetary companion: keys
   * cohorted by first-active day; for each (cohort_day, day_offset)
   * the revenue booked AT that offset, the CUMULATIVE revenue, and
   * cumulative revenue per cohort user in integral micros (the
   * "when does a cohort pay back" curve). Revenue sums ride DECIMAL
   * micros (exact, order-independent); the cumulative window runs on
   * the cohort×offset matrix (calendar-sized), keyed per cohort.
   * One event-volume shuffle (per-key first-day + daily revenue
   * share the key), cohort sizes derived from the same relation.
   */
  def cohortLtv(df: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, maxOffsetDays: Int): DataFrame = {
    val byKeyDay = df.select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"),
        col(valueCol).cast("decimal(18,4)").as("v"))
      .groupBy(col("k"), col("d")).agg(sum(col("v")).as("dv"))
    val withCohort = byKeyDay
      .withColumn("d0", min(col("d")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
      .withColumn("day_offset", datediff(col("d"), col("d0")))
      .filter(col("day_offset") <= maxOffsetDays)
    val cohortSizes = withCohort.filter(col("day_offset") === 0)
      .groupBy(col("d0")).agg(count(lit(1)).as("cohort_n"))
    val cells = withCohort
      .groupBy(col("d0"), col("day_offset"))
      .agg((sum(col("dv")) * lit(10000)).cast("decimal(38,0)").as("rev_units"))
      .join(cohortSizes, "d0")
      .withColumn("cum_rev_units", sum(col("rev_units")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("d0"))
          .orderBy(col("day_offset"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    cells.select(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
      col("day_offset"), col("cohort_n"),
      (col("rev_units") * lit(100)).cast("double").as("revenue_micro"),
      (col("cum_rev_units") * lit(100)).cast("double").as("cum_revenue_micro"),
      expr("cast(cum_rev_units * 100 div cohort_n as bigint)").as("ltv_per_user_micro"))
  }

  def retention(df: DataFrame, keyCol: String, tsCol: String,
                maxOffsetDays: Int): DataFrame = {
    val byKey = df.select(col(keyCol).as("k"), to_date(col(tsCol)).as("d"))
      .groupBy(col("k")).agg(collect_set(col("d")).as("ds"))
      .select(array_min(col("ds")).as("d0"), explode(col("ds")).as("d"))
    byKey
      .withColumn("day_offset", datediff(col("d"), col("d0")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
