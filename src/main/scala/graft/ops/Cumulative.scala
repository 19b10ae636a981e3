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
 * counts, Gini rank-weighted sums) ride distinct-value relations that
 * are usually small — but "usually" is not a contract, and a
 * continuous corpus-scale column would collapse the plan to a single
 * task. This helper keeps the same answers with no single-task stage:
 *
 *  1. equi-width bucket on the numeric ordering column — bounds from
 *     a 1-row broadcast aggregate; the bucket function is monotone in
 *     the ordering column, so bucket order == value order and rows
 *     with equal ordering values always share a bucket;
 *  2. per-bucket inclusive running sums — ordinary PARTITIONED window,
 *     nBuckets-way parallel;
 *  3. per-bucket totals (≤nBuckets rows) + a broadcast triangular
 *     join summing all strictly-earlier buckets into an offset;
 *  4. result = local running sum + bucket offset.
 *
 * No driver collect, no single-partition exchange; the only
 * sub-linear relations are the 1-row bounds and the ≤nBuckets-row
 * totals/offsets (both broadcast).
 *
 * Contract: `orderCol` must be numeric and non-null; the FULL
 * ordering key (orderCol, tieCols…) must be unique per row (a running
 * sum among exact ties is order-ambiguous in any engine — the callers
 * all ride per-distinct-value aggregate relations where this holds by
 * construction). `tieCols` only break ties WITHIN a bucket: equal
 * orderCol values always land in the same bucket, so the tiebreak
 * never needs to cross buckets. The double cast used for bucketing is
 * monotone (non-strict) for every numeric input type, so precision
 * loss can only merge adjacent values into one bucket — never reorder
 * them.
 */
object Cumulative {

  /**
   * Adds, for each `(outName, valueExpr)` pair, a column `outName` =
   * running SUM(valueExpr) over rows up to AND INCLUDING the current
   * row in (orderCol, tieCols…) ascending order. Null `valueExpr`
   * rows contribute nothing (SQL SUM semantics); a prefix that is all
   * null sums to null, exactly as the single-partition window did.
   * Exclusive prefixes are one subtraction away:
   * `running − current`.
   */
  def runningSums(df: DataFrame, orderCol: String, tieCols: Seq[String],
                  sums: Seq[(String, Column)], nBuckets: Int = 64): DataFrame = {
    require(sums.nonEmpty, "need at least one running sum")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val o = col(orderCol).cast("double")
    val bounds = df.agg(min(o).as("_cum_mn"), max(o).as("_cum_mx"))
    val bkt = when(col("_cum_mx") > col("_cum_mn"),
        least(lit(nBuckets - 1),
          floor((o - col("_cum_mn")) * nBuckets / (col("_cum_mx") - col("_cum_mn")))))
      .otherwise(lit(0)).cast("int")
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_cum_bkt", bkt)
      .drop("_cum_mn", "_cum_mx")
    val wLoc = Window.partitionBy(col("_cum_bkt"))
      .orderBy((col(orderCol) +: tieCols.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(withB) { case (acc, (name, v)) =>
      acc.withColumn(s"_cum_loc_$name", sum(v).over(wLoc))
    }
    val totAggs = sums.map { case (name, v) => sum(v).as(s"_cum_tot_$name") }
    val totals = withB.groupBy(col("_cum_bkt")).agg(totAggs.head, totAggs.tail: _*)
    val offAggs = sums.map { case (name, _) =>
      sum(col(s"b._cum_tot_$name")).as(s"_cum_off_$name")
    }
    val off = totals.as("a")
      .join(broadcast(totals.as("b")), col("b._cum_bkt") < col("a._cum_bkt"), "left")
      .groupBy(col("a._cum_bkt").as("_cum_bkt"))
      .agg(offAggs.head, offAggs.tail: _*)
    val joined = local.join(broadcast(off), Seq("_cum_bkt"), "left")
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
