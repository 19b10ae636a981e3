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
  /** Violation = non-null value outside [lo, hi] — including non-null
    * values that fail the numeric cast (garbage in a stringly column). */
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
    // the same rule declared twice would alias two aggregate columns
    // identically and die mid-plan with AMBIGUOUS_REFERENCE; the
    // report is identical either way, so dedupe by label
    val distinctRules = rules.distinctBy(_.label)
    val rowLocal: Seq[(String, Column)] = distinctRules.collect {
      case r @ NotNull(c) => r.label -> col(c).isNull
      case r @ InRange(c, lo, hi) =>
        // a non-null value that fails the double cast (e.g. "N/A" in a
        // string column) IS a violation — cast-null must not sail
        // through the range gate. try_cast, not cast: ANSI mode makes
        // a plain cast THROW on the very garbage this rule exists to count
        val cv = expr(s"try_cast(`$c` as double)")
        r.label -> (col(c).isNotNull && (cv.isNull || cv < lo || cv > hi))
      case r @ AcceptedValues(c, vs) =>
        r.label -> (col(c).isNotNull && !col(c).cast("string").isin(vs: _*))
      case r @ MatchesRegex(c, re) =>
        // FULL match per the contract: rlike alone is substring search
        // and would count "junk1234junk" as matching "[0-9]{4}"
        r.label -> (col(c).isNotNull &&
          !col(c).cast("string").rlike(s"^(?:$re)$$"))
      case r @ Satisfies(p, _) => r.label -> !coalesce(expr(p), lit(false))
    }
    val reports = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (rowLocal.nonEmpty) {
      // coalesce each sum: on an EMPTY table sum() is null and a
      // null pass would silently satisfy neither a gate nor an alert
      val aggs = count(lit(1)).as("_n") +: rowLocal.map { case (label, bad) =>
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(label)
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
    distinctRules.foreach {
      case r @ Unique(cols0) =>
        // ONE pass: the per-key group sizes yield both the row total
        // (sum of all sizes) and the violation count (rows in groups
        // of >1) — no separate full-table recount
        reports += df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("_c"))
          .groupBy().agg(
            coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("_c") > 1, col("_c")).otherwise(0L)), lit(0L))
              .as("n_violations"))
          .select(lit(r.label).as("rule"), col("n_rows"), col("n_violations"))
      case r @ RefIntegrity(c, ref, refC) =>
        // ONE pass over df: a left join keeps every row, so the same
        // aggregate counts rows and non-null keys without a reference
        reports += df.select(col(c).as("_k"))
          .join(ref.select(col(refC).as("_ref_k")).distinct(),
            col("_k") === col("_ref_k"), "left")
          .groupBy().agg(
            count(lit(1)).as("n_rows"),
            coalesce(sum(when(col("_k").isNotNull && col("_ref_k").isNull, 1L)
              .otherwise(0L)), lit(0L)).as("n_violations"))
          .select(lit(r.label).as("rule"), col("n_rows"), col("n_violations"))
      case _ => ()
    }
    reports.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
