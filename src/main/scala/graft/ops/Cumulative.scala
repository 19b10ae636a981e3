package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed running sums over a globally-ordered relation — the
 * two-level replacement for `Window.orderBy(...)` with no partition
 * spec, which Spark executes by moving the WHOLE relation into one
 * task (its own `WindowExec: No Partition Defined` warning). The
 * repo's cumulative operators (AUC rank sums, Kaplan–Meier at-risk
 * counts, Gini rank-weighted sums, per-group exact percentiles) ride
 * distinct-value relations that are usually small — but "usually" is
 * not a contract, and a continuous corpus-scale column would collapse
 * the plan to a single task. This helper keeps the same answers with
 * no single-task stage:
 *
 *  1. equi-width bucket on the numeric ordering column — bounds from
 *     a per-group broadcast aggregate; the bucket function is
 *     monotone in the ordering column, so bucket order == value order
 *     and rows with equal ordering values always share a bucket;
 *  2. per-(group, bucket) inclusive running sums — ordinary
 *     PARTITIONED window, group×nBuckets-way parallel;
 *  3. per-(group, bucket) totals (≤ groups·nBuckets rows) + a
 *     broadcast triangular join summing all strictly-earlier buckets
 *     of the SAME group into an offset;
 *  4. result = local running sum + bucket offset.
 *
 * No driver collect, no single-partition exchange; the only
 * sub-linear relations are the per-group bounds and the
 * totals/offsets (both broadcast, group-cardinality sized).
 *
 * Contract: `orderCol` must be numeric and non-null (non-FINITE
 * values are handled: NaN and +Inf land in the last bucket, -Inf in
 * the first, matching Spark's ascending sort where NaN is greatest —
 * and they are excluded from the bucket bounds so they cannot poison
 * the equi-width arithmetic for the finite rows); the FULL
 * ordering key (partitionCols…, orderCol, tieCols…) must be unique
 * per row (a running sum among exact ties is order-ambiguous in any
 * engine — the callers all ride per-distinct-value aggregate
 * relations where this holds by construction). `tieCols` only break
 * ties WITHIN a bucket: equal orderCol values always land in the same
 * bucket, so the tiebreak never needs to cross buckets. The double
 * cast used for bucketing is monotone (non-strict) for every numeric
 * input type, so precision loss can only merge adjacent values into
 * one bucket — never reorder them. A partition column that
 * constant-folds (e.g. `lit("all")`) is fine: the bucket column keeps
 * the window spec non-degenerate either way.
 */
object Cumulative {

  /**
   * Adds, for each `(outName, valueExpr)` pair, a column `outName` =
   * running SUM(valueExpr) over rows up to AND INCLUDING the current
   * row in (orderCol, tieCols…) ascending order, independently per
   * `partitionCols` group (empty = one global ordering). Null
   * `valueExpr` rows contribute nothing (SQL SUM semantics); a prefix
   * that is all null sums to null, exactly as a single-partition
   * window would. Exclusive prefixes are one subtraction away:
   * `running − current`.
   */
  def runningSums(df: DataFrame, orderCol: String, tieCols: Seq[String],
                  sums: Seq[(String, Column)], nBuckets: Int = 64,
                  partitionCols: Seq[String] = Nil): DataFrame = {
    require(sums.nonEmpty, "need at least one running sum")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val o = col(orderCol).cast("double")
    // Non-finite ordering values would poison the whole bucket
    // arithmetic (a NaN/Inf max makes every row's bucket NaN→null and
    // the offset join silently drops prefixes): bounds are computed
    // over FINITE values only, and non-finite rows are pinned to the
    // bucket matching Spark's window sort order (NaN and +Inf last,
    // -Inf first) — the within-bucket window then orders them exactly
    // as a single-partition window would.
    val oFinite = !isnan(o) && o =!= lit(Double.PositiveInfinity) &&
      o =!= lit(Double.NegativeInfinity)
    val pCols = partitionCols.map(col)
    val bounds = (if (partitionCols.isEmpty) df.groupBy() else df.groupBy(pCols: _*))
      .agg(min(when(oFinite, o)).as("_cum_mn"), max(when(oFinite, o)).as("_cum_mx"))
    val bkt = when(isnan(o) || o === lit(Double.PositiveInfinity), lit(nBuckets - 1))
      .when(o === lit(Double.NegativeInfinity), lit(0))
      .when(col("_cum_mx") > col("_cum_mn"),
        least(lit(nBuckets - 1),
          floor((o - col("_cum_mn")) * nBuckets / (col("_cum_mx") - col("_cum_mn")))))
      .otherwise(lit(0)).cast("int")
    // null-safe group joins throughout: a null partition key is its
    // own group under groupBy AND under a window partition — plain
    // equality joins would silently drop those rows.
    val boundsR = bounds.select(
      partitionCols.map(k => col(k).as(s"_cum_p_$k")) ++
        Seq(col("_cum_mn"), col("_cum_mx")): _*)
    val joined0 =
      if (partitionCols.isEmpty) df.crossJoin(broadcast(boundsR))
      else df.join(broadcast(boundsR),
        partitionCols.map(k => col(k) <=> col(s"_cum_p_$k")).reduce(_ && _))
    val withB = joined0.withColumn("_cum_bkt", bkt)
      .drop("_cum_mn" +: "_cum_mx" +: partitionCols.map(k => s"_cum_p_$k"): _*)
    val wLoc = Window.partitionBy(pCols :+ col("_cum_bkt"): _*)
      .orderBy((col(orderCol) +: tieCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(withB) { case (acc, (name, v)) =>
      acc.withColumn(s"_cum_loc_$name", sum(v).over(wLoc))
    }
    val totAggs = sums.map { case (name, v) => sum(v).as(s"_cum_tot_$name") }
    val totals = withB.groupBy(pCols :+ col("_cum_bkt"): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val offAggs = sums.map { case (name, _) =>
      sum(col(s"b._cum_tot_$name")).as(s"_cum_off_$name")
    }
    val sameGroup = (partitionCols.map(k => col(s"b.$k") <=> col(s"a.$k"))
      :+ (col("b._cum_bkt") < col("a._cum_bkt"))).reduce(_ && _)
    val off = totals.as("a")
      .join(broadcast(totals.as("b")), sameGroup, "left")
      .groupBy(partitionCols.map(k => col(s"a.$k").as(s"_cum_p_$k"))
        :+ col("a._cum_bkt").as("_cum_obkt"): _*)
      .agg(offAggs.head, offAggs.tail: _*)
    val offCond = (partitionCols.map(k => col(k) <=> col(s"_cum_p_$k"))
      :+ (col("_cum_bkt") === col("_cum_obkt"))).reduce(_ && _)
    val joined = local.join(broadcast(off), offCond, "left")
      .drop("_cum_obkt" +: partitionCols.map(k => s"_cum_p_$k"): _*)
    val finished = sums.foldLeft(joined) { case (acc, (name, _)) =>
      // SQL SUM semantics across the two levels: null local prefix +
      // non-null offset = offset (and vice versa); null only when BOTH
      // levels saw no non-null value yet.
      acc.withColumn(name, coalesce(
        col(s"_cum_loc_$name") + col(s"_cum_off_$name"),
        col(s"_cum_loc_$name"), col(s"_cum_off_$name")))
    }
    finished.drop("_cum_bkt" +:
      sums.flatMap { case (name, _) =>
        Seq(s"_cum_loc_$name", s"_cum_off_$name")
      }: _*)
  }
}
