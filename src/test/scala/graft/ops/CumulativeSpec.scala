package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Cumulative.runningSums]]: the bucketed two-level prefix sum must
  * be value-identical to the single-partition window it replaces, and
  * the plans of the operators that use it (AUC, Kaplan–Meier, Gini
  * concentration) must contain NO partition-less WindowExec — the
  * single-task collapse the helper exists to prevent. */
class CumulativeSpec extends SparkTestBase {
  import spark.implicits._

  /** Every Window node in the executed plan must carry a partition
    * spec. A partition-less Window renders as `Window [fns], [order]`
    * (two bracket groups); a partitioned one as
    * `Window [fns], [part], [order]` (three). */
  private def assertNoBareWindow(df: DataFrame): Unit = {
    df.collect() // force AQE to finalize the plan
    val plan = df.queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(winLines.nonEmpty, s"expected at least one Window node:\n$plan")
    winLines.foreach { l =>
      assert(l.split("\\], \\[").length >= 3,
        s"partition-less Window in plan line:\n$l\n\nfull plan:\n$plan")
    }
  }

  test("runningSums == single-partition window (negatives, many buckets)") {
    // unique keys spanning negatives so bucket 0 holds negative values
    val df = (1 to 500).map(i => ((i * 7) % 501 - 250, (i % 13).toLong - 3))
      .toDF("k", "v")
    val got = Cumulative.runningSums(df, "k", Nil, Seq("cum" -> col("v")),
      nBuckets = 8)
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
    assert(got.select("k", "cum").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      == want.select("k", "cum").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
  }

  test("runningSums: nulls skipped; all-null prefix stays null across buckets") {
    val df = Seq(
      (1, None: Option[Long]), (2, None), (3, Some(5L)), (4, None),
      (10, Some(2L)), (20, None), (30, Some(1L)), (40, None)
    ).toDF("k", "v")
    val got = Cumulative.runningSums(df, "k", Nil, Seq("cum" -> col("v")),
      nBuckets = 4)
      .select("k", "cum").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got == Map(1 -> null, 2 -> null, 3 -> 5L, 4 -> 5L,
      10 -> 7L, 20 -> 7L, 30 -> 8L, 40 -> 8L))
  }

  test("runningSums: tie columns order within a bucket; multiple sums at once") {
    val df = Seq((1, "b", 10L), (1, "a", 1L), (2, "z", 100L))
      .toDF("k", "t", "v")
    val got = Cumulative.runningSums(df, "k", Seq("t"),
      Seq("cum" -> col("v"), "cnt" -> lit(1L)), nBuckets = 2)
      .select("t", "cum", "cnt").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((1L, 1L)), "b" -> ((11L, 2L)), "z" -> ((111L, 3L))))
  }

  test("runningSums partitioned: per-group prefixes, null group key kept, constant group no bare window") {
    val df = Seq(
      (Some("a"), 1, 10L), (Some("a"), 2, 20L), (Some("a"), 3, 30L),
      (Some("b"), 1, 1L), (Some("b"), 5, 2L),
      (None: Option[String], 2, 7L), (None, 4, 8L)
    ).toDF("g", "k", "v")
    val got = Cumulative.runningSums(df, "k", Nil, Seq("cum" -> col("v")),
        nBuckets = 3, partitionCols = Seq("g"))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1)) -> r.getLong(3)).toMap
    assert(got == Map(
      (Some("a"), 1) -> 10L, (Some("a"), 2) -> 30L, (Some("a"), 3) -> 60L,
      (Some("b"), 1) -> 1L, (Some("b"), 5) -> 3L,
      (None, 2) -> 7L, (None, 4) -> 15L))
    // a CONSTANT group column must not degrade to a partition-less
    // window (literal partition specs constant-fold away)
    val const = (1 to 100).map(i => ("all", i, 1L)).toDF("g", "k", "v")
    val out = Cumulative.runningSums(const, "k", Nil, Seq("cum" -> col("v")),
      nBuckets = 4, partitionCols = Seq("g"))
    assertNoBareWindow(out)
    assert(out.filter(col("k") === 100).select("cum").collect().head.getLong(0) == 100L)
  }

  test("exactPercentiles with a constant group column has no partition-less WindowExec") {
    val df = (1 to 300).map(i => ("all", (i % 37).toDouble)).toDF("g", "value")
    val out = Stats.exactPercentiles(df, "value", Seq("g"))
    assertNoBareWindow(out)
    assert(out.count() == 3)
  }

  test("runningSums: non-finite order values sort like a window (NaN/+Inf last, -Inf first)") {
    val df = Seq(
      (Double.NegativeInfinity, 1L), (-5.0, 2L), (3.0, 4L),
      (Double.PositiveInfinity, 8L), (Double.NaN, 16L)
    ).toDF("k", "v")
    val got = Cumulative.runningSums(df, "k", Nil, Seq("cum" -> col("v")),
      nBuckets = 4)
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
    def m(d: DataFrame) = d.select("v", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(got) == m(want))
    // in particular the finite rows must NOT be poisoned by the
    // non-finite bounds: prefix at 3.0 is 1+2+4
    assert(m(got)(4L) == 7L)
  }

  test("runningSums: degenerate single distinct order value (mn == mx)") {
    val df = Seq((7, 1L)).toDF("k", "v")
    val got = Cumulative.runningSums(df, "k", Nil, Seq("cum" -> col("v")))
      .select("cum").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("auc plan has no partition-less WindowExec; value unchanged") {
    val df = (1 to 200).map(i => (i % 17 * 1.0, if (i % 3 == 0) 1 else 0))
      .toDF("score", "y")
    val out = Stats.auc(df, "score", "y")
    assertNoBareWindow(out)
  }

  test("kaplanMeier plan has no partition-less WindowExec; values match hand oracle") {
    // classic small KM fixture: durations with events and censors
    val subj = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1), (5L, 0), (6L, 1))
      .toDF("dur", "ev")
    val out = Survival.kaplanMeier(subj, "dur", "ev")
    assertNoBareWindow(out)
    val rows = out.orderBy("t").collect()
    // t=1: n=6 d=1; t=2: n=5 d=1 c=1; t=3: n=3 d=1; t=6: n=1 d=1 (extinction)
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq((1L, 6L, 1L, 0L), (2L, 5L, 1L, 1L), (3L, 3L, 1L, 0L), (6L, 1L, 1L, 0L)))
    val lnSurv = rows.map(r => if (r.isNullAt(5)) null else r.getLong(5))
    def lnm(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(lnSurv(0) == lnm(5.0 / 6))
    assert(lnSurv(1) == lnm(5.0 / 6) + lnm(4.0 / 5))
    assert(lnSurv(2) == lnm(5.0 / 6) + lnm(4.0 / 5) + lnm(2.0 / 3))
    // extinction row: null step, ln_surv reads S(t-)
    assert(rows(3).isNullAt(4) && lnSurv(3) == lnSurv(2))
  }

  test("concentration plan has no partition-less WindowExec; gini matches") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0))
      .toDF("k", "v")
    val out = Stats.concentration(df, "k", "v")
    assertNoBareWindow(out)
    val r = out.collect().head
    // G = (2*(1*1+2*2+3*3+4*4) - 5*10) / (4*10) = (60-50)/40 = 0.25
    assert(r.getLong(0) == 4L && r.getLong(2) == 250000L)
  }
}
