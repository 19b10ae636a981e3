package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality profiling (the "know your table before you pipeline
 * it" report the reference's schema-driven configs assume a human
 * already did): per-column row/null/distinct counts and string-cast
 * min/max in ONE long-format relation.
 */
object Profile {

  /**
   * Profile the given columns: one output row per column with
   * n_rows, n_null, n_distinct (nulls excluded), and lexicographic
   * min/max of the string cast. Values are compared AS STRINGS so the
   * report schema is column-type-independent — callers profiling
   * float columns should expect engine-specific float formatting and
   * keep those out of cross-engine comparisons (integer and string
   * casts are portable).
   *
   * Scale shape: a row-local stack (|cols| × n rows of (name, value))
   * then one count-distinct aggregate keyed by column name. With
   * `approx = true` the distinct count is a one-pass HLL sketch
   * (approx_count_distinct) — the 100 TB default, since an exact
   * per-column distinct expands rows again for the distinct
   * aggregation; exact is the oracle path.
   */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    val distinctAgg =
      if (approx) approx_count_distinct(col("v")).as("n_distinct")
      else countDistinct(col("v")).as("n_distinct")
    stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      distinctAgg,
      min(col("v")).as("min_val"), max(col("v")).as("max_val"))
  }

  /**
   * k-anonymity audit (Sweeney 2002): equivalence-class sizes over a
   * quasi-identifier column set — a row in a class smaller than `k`
   * is re-identifiable by joining those columns against an external
   * table, the canonical privacy gate before a corpus with
   * user-derived metadata ships. One row per equivalence class with
   * its size and the at_risk verdict; downstream suppression is
   * a semi-join of the data against the at_risk classes. ONE
   * map-side-combined shuffle on the QI key (counts collapse per
   * partition first, so a 100 TB table moves |classes| rows).
   */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, "k < 2 flags nothing")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /**
   * Referential-integrity audit for one FK relation: total child
   * rows, NULL foreign keys (reported separately — a NULL FK is a
   * different defect than a dangling one), orphans (non-null keys
   * with no parent), and the orphan rate in integral micros over the
   * non-null population. The anti-join shuffles on the key (AQE
   * broadcasts a small parent side); both 1-row aggregates combine
   * map-side. Union several calls for a whole-schema audit report.
   */
  def refIntegrity(label: String, child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val totals = child.agg(count(lit(1)).as("n_rows"),
      count(when(col(childKey).isNull, 1)).as("n_null_keys"))
    val orphans = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("_pk")).distinct(),
        col(childKey) === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    totals.crossJoin(orphans)
      .select(lit(label).as("relation"), col("n_rows"), col("n_null_keys"),
        col("n_orphans"),
        when(col("n_rows") > col("n_null_keys"),
          expr("n_orphans * 1000000 div (n_rows - n_null_keys)"))
          .otherwise(lit(0L)).as("orphan_micro"))
  }
}
