package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Kaplan–Meier survival estimation over (duration, event) subjects —
 * time-to-conversion / churn-time analysis with right-censoring done
 * correctly (a user who never converted is "still at risk up to their
 * observation end", not a zero).
 *
 * Output: one row per distinct EVENT time t with n_at_risk, n_events,
 * n_censored (censorings AT t), the step factor ln(1 − d/n) and the
 * running ln S(t) — both in the repo's micro quantization
 * (floor(x·10⁶ + ½); the ln parity between JVM and libm at micro
 * resolution is the established oracle precedent — unigram NLL et
 * al.). ln-space keeps the estimate a SUM (windowed, order-fixed);
 * exp() is left to the consumer because its last-ulp behavior is not
 * part of the cross-engine contract.
 *
 * Scale shape: one subject-volume aggregate to the per-duration
 * relation (distinct durations ≤ distinct timestamps — calendar-ish,
 * not data-sized); n_at_risk comes from a cumulative window over that
 * ordered relation (N − subjects finished strictly earlier), never a
 * times×subjects join.
 */
object Survival {

  def kaplanMeier(subjects: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val base = subjects
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0 &&
        col(eventCol).isNotNull) // a null flag would count at risk yet
      .select(col(durationCol).cast("long").as("dur"), // neither event nor censor
        col(eventCol).cast("int").as("ev"))
    val perT = base.groupBy(col("dur"))
      .agg(sum(col("ev")).as("d"), sum(lit(1) - col("ev")).as("c"),
        count(lit(1)).as("all_t"))
    // n_at_risk = N − subjects finished strictly earlier: the prefix
    // count comes from the bucketed two-level running sum (no
    // single-partition WindowExec even at data-sized duration
    // cardinality); N is a 1-row broadcast.
    val totalRow = perT.agg(sum(col("all_t")).as("_n_total"))
    val enriched = graft.ops.Cumulative.runningSums(perT, "dur", Nil,
        Seq("_cum_all" -> col("all_t")))
      .withColumn("_before", col("_cum_all") - col("all_t"))
      .crossJoin(broadcast(totalRow))
      .withColumn("n_at_risk", col("_n_total") - col("_before"))
      .filter(col("d") > 0) // KM steps only at event times
    val lnTerm = floor(
      log((col("n_at_risk") - col("d")).cast("double") / col("n_at_risk").cast("double"))
        * lit(1e6) + lit(0.5)).cast("long")
    val stepped = enriched
      // d == n_at_risk means survival hits exactly 0 at t (necessarily
      // the last event row): its ln step is NULL and its ln_surv_micro
      // reads as S(t−), the value just before extinction.
      .withColumn("ln_step_micro",
        when(col("d") < col("n_at_risk"), lnTerm))
    graft.ops.Cumulative.runningSums(stepped, "dur", Nil,
        Seq("ln_surv_micro" -> col("ln_step_micro")))
      .select(col("dur").as("t"), col("n_at_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("ln_step_micro"), col("ln_surv_micro"))
  }
}
