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
