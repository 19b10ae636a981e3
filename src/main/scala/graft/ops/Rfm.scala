package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * RFM (recency / frequency / monetary) user segmentation — the classic
 * behavioral-cohort report over an event stream.
 *
 * Scoring uses FIXED domain thresholds (business-rule banding), not
 * global quantiles: row-local after the one per-user aggregate, so the
 * operator never needs a corpus-wide sort/ntile (the quantile variant
 * of banding lives in `Sampling.quantileBuckets` — compose if wanted).
 * Recency is measured against the corpus max timestamp (not wall
 * clock) so reruns are deterministic; the 1-row max rides a broadcast.
 *
 * Scale shape: ONE event-volume shuffle (user-keyed agg, map-side
 * combined) + a broadcast of one row. Monetary sums accumulate in
 * DECIMAL (exact, order-independent); day arithmetic is integral on
 * floored epoch seconds.
 */
object Rfm {

  def rfm(events: DataFrame, userCol: String, tsCol: String, valueCol: String,
          recencyDayBands: (Int, Int) = (2, 7),
          freqBands: (Long, Long) = (20L, 5L),
          monetaryBands: (BigDecimal, BigDecimal) = (BigDecimal(500), BigDecimal(100))): DataFrame = {
    require(recencyDayBands._1 <= recencyDayBands._2 &&
      freqBands._1 >= freqBands._2 && monetaryBands._1 >= monetaryBands._2,
      "bands must be ordered best-first")
    val epoch = floor(unix_timestamp(col(tsCol))).cast("long")
    val perUser = events.groupBy(col(userCol).as("user_id"))
      .agg(max(epoch).as("last_epoch"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,4)")).as("monetary_dec"))
    val corpusMax = events.agg(max(epoch).as("corpus_max_epoch"))
    val scored = perUser.crossJoin(broadcast(corpusMax))
      .withColumn("recency_days",
        expr("(corpus_max_epoch - last_epoch) div 86400"))
      .withColumn("r_score",
        when(col("recency_days") <= recencyDayBands._1, 3)
          .when(col("recency_days") <= recencyDayBands._2, 2).otherwise(1))
      .withColumn("f_score",
        when(col("frequency") >= freqBands._1, 3)
          .when(col("frequency") >= freqBands._2, 2).otherwise(1))
      .withColumn("m_score",
        when(col("monetary_dec") >= lit(monetaryBands._1).cast("decimal(18,4)"), 3)
          .when(col("monetary_dec") >= lit(monetaryBands._2).cast("decimal(18,4)"), 2)
          .otherwise(1))
      .withColumn("segment",
        when(col("r_score") === 3 && col("f_score") === 3 && col("m_score") === 3, "champion")
          .when(col("r_score") >= 2 && col("f_score") >= 2, "loyal")
          .when(col("r_score") === 1 && col("f_score") >= 2, "at_risk")
          .when(col("r_score") >= 2 && col("f_score") === 1, "new_or_casual")
          .otherwise("hibernating"))
    scored.select(col("user_id"), col("recency_days"), col("frequency"),
      col("monetary_dec").cast("double").as("monetary"),
      col("r_score"), col("f_score"), col("m_score"), col("segment"))
  }

  /**
   * Train-ready churn labels with a LEAKAGE-DISCIPLINED temporal
   * split: features come ONLY from events in the first
   * `featureDays` whole days after the corpus min (frequency,
   * exact-DECIMAL monetary, distinct types, last-seen offset); the
   * label — churned = zero activity in the last `labelDays` whole
   * days before the corpus max — comes ONLY from the label window.
   * Users with no feature-window activity are excluded (nothing to
   * train on); the two windows may not overlap. Min/max ride one
   * broadcast row; one user-keyed shuffle per window.
   */
  def churnLabels(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, typeCol: String,
                  featureDays: Int, labelDays: Int): DataFrame = {
    require(featureDays >= 1 && labelDays >= 1, "windows must be >= 1 day")
    val epoch = floor(unix_timestamp(col(tsCol))).cast("long")
    val bounds = events.agg(min(epoch).as("_mn"), max(epoch).as("_mx"))
    val e = events.withColumn("_ep", epoch).crossJoin(broadcast(bounds))
    val feat = e.filter(col("_ep") < col("_mn") + lit(featureDays.toLong * 86400))
      .groupBy(col(userCol).as("user_id"))
      .agg(count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("monetary"),
        count_distinct(col(typeCol)).as("n_event_types"),
        max(expr("(_ep - _mn) div 86400")).as("last_seen_day"))
    val active = e.filter(col("_ep") >= col("_mx") - lit(labelDays.toLong * 86400) + 1)
      .select(col(userCol).as("user_id")).distinct()
      .withColumn("_active", lit(1))
    feat.join(active, Seq("user_id"), "left")
      .withColumn("churned", col("_active").isNull)
      .drop("_active")
  }
}
