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
}
