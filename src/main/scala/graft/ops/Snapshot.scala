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
}
