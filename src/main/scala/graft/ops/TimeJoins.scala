package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series joins Spark lacks as builtins, composed scale-right.
 *
 * asofJoin: "for each left row, the most recent right row with
 * right.ts <= left.ts per key". NOT implemented as a point-lookup join:
 * both sides union into one stream, ONE shuffle+sort per key, and a
 * last-non-null window carries the right row forward (LOCF). Cost is
 * sort-merge over n_left + n_right — the plan you want at 100 TB.
 *
 * bandedRangeJoin: inequality band joins explode into O(n*m) under a
 * naive cross join; binning both sides by window-sized buckets makes
 * each left row probe exactly two buckets, then the exact predicate
 * filters — one equi-shuffle, bounded candidates.
 */
object TimeJoins {

  /**
   * As-of (backward) join. Right rows must be unique per (keys, ts) —
   * pre-dedupe if needed. Right payload columns arrive prefixed.
   *
   * `toleranceSecs`: a feature-store staleness bound — a match older
   * than the window NULLS OUT (row-local filter on the carried struct;
   * the left row itself is kept, LEFT-ASOF semantics). `inner = true`
   * instead drops left rows with no (in-tolerance) match — DuckDB's
   * default ASOF JOIN semantics.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightVals: Seq[String],
               prefix: String = "asof_",
               toleranceSecs: Option[Long] = None,
               inner: Boolean = false): DataFrame = {
    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_t") :+ lit(0).as("_side") :+
        struct(col(rightTs).as("_rts") +: rightVals.map(col): _*).as("_rv")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right row at the SAME ts sorts before left (inclusive <=)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_t").asc, col("_side").asc)
    val filled = unioned.withColumn("_last_rv",
      last(col("_rv"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bounded = toleranceSecs.fold(filled) { tol =>
      filled.withColumn("_last_rv",
        when(unix_timestamp(col("_t")) - unix_timestamp(col("_last_rv._rts")) <= tol,
          col("_last_rv")))
    }
    val matched =
      if (inner) bounded.filter(col("_side") === 1 && col("_last_rv").isNotNull)
      else bounded.filter(col("_side") === 1)
    val outCols: Seq[Column] =
      left.columns.toSeq.map(col) ++
        rightVals.map(v => col(s"_last_rv.$v").as(s"$prefix$v"))
    matched.select(outCols: _*)
  }

  /**
   * Pairs (a, b) sharing `keys` with b.ts in [a.ts, a.ts + windowSec].
   * Bin size = window size: a's candidates live in a's bin or the next.
   */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      windowSec: Long): DataFrame = {
    val aBin = floor(unix_timestamp(col(leftTs)) / windowSec)
    val bBin = floor(unix_timestamp(col(rightTs)) / windowSec)
    // Alias both sides so self-joins (left and right sharing lineage)
    // resolve explicitly instead of via Spark's ambiguous-self-join
    // repair, which logs "trivially true equals predicate" and is
    // resolver-version-dependent.
    val a = left.withColumn("_bin", explode(array(aBin, aBin + 1))).alias("_l")
    val b = right.withColumn("_bin", bBin).alias("_r")
    a.join(b,
        keys.map(k => col(s"_l.$k") === col(s"_r.$k")).reduce(_ && _) &&
          (col("_l._bin") === col("_r._bin")))
      .filter(col(s"_r.$rightTs") >= col(s"_l.$leftTs") &&
        unix_timestamp(col(s"_r.$rightTs")) - unix_timestamp(col(s"_l.$leftTs")) <= windowSec)
      .drop("_bin")
  }
}
