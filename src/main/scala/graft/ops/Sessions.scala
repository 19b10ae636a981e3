package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event table (batch form; the
 * streaming face is StreamOps): a new session starts when the gap to
 * the previous event of the same key exceeds `gapSeconds`. One shuffle
 * on the key; session ids are running sums of new-session flags.
 * `tiebreak` columns make the within-key order total (equal
 * timestamps would otherwise make lag() nondeterministic).
 */
object Sessions {

  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long, tiebreak: Seq[String] = Seq.empty): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tiebreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull, 1L)
      .when(unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates (count, span, decimal-exact value sum). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, gapSeconds: Long,
                   tiebreak: Seq[String] = Seq.empty): DataFrame =
    sessionize(df, keyCol, tsCol, gapSeconds, tiebreak)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol)))).as("span_secs"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total_value"))
}
