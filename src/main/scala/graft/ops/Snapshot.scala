package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot diff (CDC-style): classify rows as added / removed /
 * changed between two versions of a keyed table. The ETL staple for
 * incremental loads and reconciliation reports.
 *
 * Scale shape: ONE shuffle per side (the full-outer join keys) and a
 * row-local classification — at 100 TB both snapshots bucketed on the
 * key make even that shuffle disappear. Presence is tracked with
 * explicit marker columns (not key-null checks), so null keys and
 * null values classify correctly; value comparison is null-safe
 * (`<=>`).
 */
object Snapshot {

  def diff(oldDf: DataFrame, newDf: DataFrame,
           keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty)
    val o = oldDf.select(
      keys.map(k => col(k).as(s"_ok_$k")) ++
        valueCols.map(c => col(c).as(s"old_$c")) :+ lit(true).as("_o_present"): _*)
    val n = newDf.select(
      keys.map(k => col(k).as(s"_nk_$k")) ++
        valueCols.map(c => col(c).as(s"new_$c")) :+ lit(true).as("_n_present"): _*)
    val cond = keys.map(k => col(s"_ok_$k") <=> col(s"_nk_$k")).reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
    val oPresent = coalesce(col("_o_present"), lit(false))
    val nPresent = coalesce(col("_n_present"), lit(false))
    val allEqual = valueCols.map(c => col(s"old_$c") <=> col(s"new_$c")).reduce(_ && _)
    val keyCols: Seq[Column] = keys.map(k => coalesce(col(s"_ok_$k"), col(s"_nk_$k")).as(k))
    val valOut: Seq[Column] = valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))
    joined
      .withColumn("change_type",
        when(!oPresent, lit("added"))
          .when(!nPresent, lit("removed"))
          .otherwise(lit("changed")))
      .filter(!oPresent || !nPresent || !allEqual)
      .select(keyCols ++ valOut :+ col("change_type"): _*)
  }

  /**
   * SCD Type-2 validity intervals (Kimball's slowly-changing-dimension
   * history): turn a stream of keyed change events into one row per
   * version with [effective_from, effective_to) bounds and an
   * is_current flag — effective_to is the NEXT change's timestamp
   * (open interval, null on the current version). Consecutive events
   * with an UNCHANGED value collapse into the earlier version (the
   * standard "no-op update suppression"), null-safely. Deterministic
   * given a total (ts, tiebreak) order per key.
   *
   * Scale shape: ONE event-volume shuffle (the per-key window); the
   * collapse and interval assembly are lag/lead over the same
   * partitioning — sorts, no further exchanges.
   */
  def scd2(events: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCol: String, tiebreak: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val keyPart = keyCols.map(col)
    val order = (col(tsCol) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyPart: _*).orderBy(order: _*)
    events
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      // version starts: the first event per key, or a value change
      .withColumn("_is_start",
        row_number().over(w) === 1 || !(col(valueCol) <=> col("_prev")))
      .filter(col("_is_start"))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select(keyPart ++ Seq(col(valueCol), col("effective_from"),
        col("effective_to"), col("is_current")): _*)
  }
}
