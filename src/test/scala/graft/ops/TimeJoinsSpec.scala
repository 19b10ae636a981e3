package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

class TimeJoinsSpec extends SparkTestBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asofJoin picks the most recent right row at-or-before each left ts") {
    import spark.implicits._
    val trades = Seq((1L, "A", ts(5)), (2L, "A", ts(20)), (3L, "B", ts(10)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", ts(0), 10.0), ("A", ts(5), 11.0), ("A", ts(15), 12.0),
      ("B", ts(30), 99.0))
      .toDF("sym", "ts", "px")
    val out = TimeJoins.asofJoin(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.doubleValue)).toMap
    assert(out == Map(
      1L -> Some(11.0), // equal ts counts (inclusive <=)
      2L -> Some(12.0), // most recent prior quote
      3L -> None))      // B's only quote is later -> no match
  }

  test("asofJoin toleranceSecs: stale match nulls out (left kept); inner drops it") {
    import spark.implicits._
    val trades = Seq((1L, "A", ts(5)), (2L, "A", ts(45)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", ts(0), 10.0)).toDF("sym", "ts", "px")
    // 10-minute staleness bound: trade 1 (5 min after the quote) keeps
    // its match; trade 2 (45 min) is stale -> null but NOT dropped
    val outer = TimeJoins.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
        Seq("px"), toleranceSecs = Some(600L))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.doubleValue)).toMap
    assert(outer == Map(1L -> Some(10.0), 2L -> None))
    val inner = TimeJoins.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
        Seq("px"), toleranceSecs = Some(600L), inner = true)
      .select("trade_id").as[Long].collect().toSeq
    assert(inner == Seq(1L))
  }

  test("asofJoin plan: one key exchange, no cartesian or broadcast-nested-loop") {
    import spark.implicits._
    val trades = Seq((1L, "A", ts(5))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", ts(0), 10.0)).toDF("sym", "ts", "px")
    val plan = TimeJoins.asofJoin(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not degenerate to a cartesian:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one key exchange, got $exchanges:\n$plan")
  }

  test("bandedRangeJoin finds pairs within the window across bin edges") {
    import spark.implicits._
    val a = Seq((1L, 10L, ts(0)), (2L, 10L, ts(58)))
      .toDF("a_id", "k", "a_ts").select($"k", $"a_id", $"a_ts")
    val b = Seq((5L, 10L, ts(30)), (6L, 10L, ts(59)), (7L, 10L, Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("b_id", "k", "b_ts").select($"k", $"b_id", $"b_ts")
    // window 45 min: a1(10:00) matches b5(10:30); a2(10:58) matches b6(10:59)
    // despite sitting in different hour bins; b7 (12:00) matches nothing
    val out = TimeJoins.bandedRangeJoin(a, b, Seq("k"), "a_ts", "b_ts", 2700L)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(out == Set((1L, 5L), (2L, 6L)))
  }
}
