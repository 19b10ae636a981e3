package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-level data contracts (the dbt-test / Great-Expectations
 * shape): declare rules, get back one report row per rule with exact
 * violation counts — the gate a production pipeline runs between
 * "loaded" and "published".
 *
 * Scale shape: every ROW-LOCAL rule (not_null, in_range,
 * accepted_values, matches_regex, custom SQL predicate) folds into
 * ONE aggregate pass over the table — adding rules adds columns to a
 * single map-side-combined aggregation, not passes. `unique` needs
 * its own groupBy (count of key groups with >1 row) and
 * `ref_integrity` one left-anti join per referenced table; both are
 * keyed shuffles with no data-volume amplification. The report is
 * rules-cardinality sized.
 */
object Expectations {

  sealed trait Rule { def label: String }
  /** Violation = null value. */
  case class NotNull(col: String) extends Rule { def label = s"not_null($col)" }
  /** Violation = non-null value outside [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def label = s"in_range($col,$lo,$hi)"
  }
  /** Violation = non-null value not in the accepted set. */
  case class AcceptedValues(col: String, values: Seq[String]) extends Rule {
    def label = s"accepted_values($col)"
  }
  /** Violation = non-null value not fully matching the regex. */
  case class MatchesRegex(col: String, regex: String) extends Rule {
    def label = s"matches_regex($col)"
  }
  /** Violation = any SQL predicate evaluating false or null. */
  case class Satisfies(predicate: String, name: String) extends Rule {
    def label = s"satisfies($name)"
  }
  /** Violation = a ROW in a key group of size > 1 (so the count is
    * "rows involved in duplication", not "extra rows"). */
  case class Unique(cols: Seq[String]) extends Rule {
    def label = s"unique(${cols.mkString(",")})"
  }
  /** Violation = non-null key with no match in the reference. */
  case class RefIntegrity(col: String, ref: DataFrame, refCol: String) extends Rule {
    def label = s"ref_integrity($col)"
  }

  /** One report row per rule: (rule, n_rows, n_violations, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) => r.label -> col(c).isNull
      case r @ InRange(c, lo, hi) =>
        r.label -> (col(c).isNotNull &&
          (col(c).cast("double") < lo || col(c).cast("double") > hi))
      case r @ AcceptedValues(c, vs) =>
        r.label -> (col(c).isNotNull && !col(c).cast("string").isin(vs: _*))
      case r @ MatchesRegex(c, re) =>
        r.label -> (col(c).isNotNull && !col(c).cast("string").rlike(re))
      case r @ Satisfies(p, _) => r.label -> !coalesce(expr(p), lit(false))
    }
    val reports = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (rowLocal.nonEmpty) {
      val aggs = count(lit(1)).as("_n") +: rowLocal.map { case (label, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(label)
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // one driver row (rules wide) unpivoted to the report shape
      // (labels carry dots — backquote so col() doesn't parse nesting)
      reports += one.select(
        explode(map(rowLocal.flatMap { case (label, _) =>
          Seq(lit(label), col(s"`$label`"))
        }: _*)).as(Seq("rule", "n_violations")),
        col("_n").as("n_rows"))
        .select(col("rule"), col("n_rows"), col("n_violations"))
    }
    rules.foreach {
      case r @ Unique(cols0) =>
        val total = df.groupBy().agg(count(lit(1)).as("n_rows"))
        val dups = df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("_c"))
          .filter(col("_c") > 1)
          .groupBy().agg(coalesce(sum(col("_c")), lit(0L)).as("n_violations"))
        reports += total.crossJoin(dups)
          .select(lit(r.label).as("rule"), col("n_rows"), col("n_violations"))
      case r @ RefIntegrity(c, ref, refC) =>
        val total = df.groupBy().agg(count(lit(1)).as("n_rows"))
        val orphans = df.filter(col(c).isNotNull)
          .join(ref.select(col(refC).as("_ref_k")).distinct(),
            col(c) === col("_ref_k"), "left_anti")
          .groupBy().agg(count(lit(1)).as("n_violations"))
        reports += total.crossJoin(orphans)
          .select(lit(r.label).as("rule"), col("n_rows"), col("n_violations"))
      case _ => ()
    }
    reports.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
