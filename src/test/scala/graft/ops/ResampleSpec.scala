package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Resample]]: grid completeness, per-bucket means, forward fill,
  * linear interpolation (hand-computed), edge behavior, and the gap
  * report — on a fixture small enough to verify by eye. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private val step = 86400L
  private def ts(day: Int, sec: Int = 0) =
    new java.sql.Timestamp((day * step + sec) * 1000L + 1704067200000L) // 2024-01-01 UTC

  test("gapFillResample: grid, mean, ffill, interpolation") {
    // user 1: day0 two obs (10, 20 -> avg 15), day3 one obs (45):
    // days 1,2 are gaps. user 2: single obs day5.
    val df = Seq(
      (1L, ts(0, 100), 10.0), (1L, ts(0, 200), 20.0), (1L, ts(3), 45.0),
      (2L, ts(5), 7.0)
    ).toDF("user_id", "ts", "value")
    val out = Resample.gapFillResample(df, Seq("user_id"), "ts", "value", step)
      .orderBy("user_id", "bucket_start").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length == 4, "day0..day3 inclusive")
    val base = 1704067200L
    assert(u1.map(_.getLong(1)).toSeq ==
      Seq(base, base + step, base + 2 * step, base + 3 * step))
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L), "n_obs")
    assert(u1(0).getDouble(3) == 15.0 && u1(3).getDouble(3) == 45.0)
    assert(u1(1).isNullAt(3) && u1(2).isNullAt(3), "v_avg null in gaps")
    assert(u1.map(_.getDouble(4)).toSeq == Seq(15.0, 15.0, 15.0, 45.0), "ffill")
    // interp: 15 + (45-15) * d/3
    assert(u1.map(_.getDouble(5)).toSeq == Seq(15.0, 25.0, 35.0, 45.0), "interp")
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getDouble(5) == 7.0)
  }

  test("edge gaps with no preceding observation backfill from the next") {
    // craft a leading gap by making the first bucket observed and the
    // middle missing is covered above; here: obs at day2 and day4 only,
    // bucket 3 interpolates, buckets before day2 don't exist (grid
    // starts at first observation) — assert the contract explicitly
    val df = Seq((1L, ts(2), 4.0), (1L, ts(4), 8.0)).toDF("user_id", "ts", "value")
    val out = Resample.gapFillResample(df, Seq("user_id"), "ts", "value", step)
      .orderBy("bucket_start").collect()
    assert(out.length == 3, "grid spans first..last observation only")
    assert(out(1).getDouble(5) == 6.0)
  }

  test("null values count as observations but contribute no sum") {
    val df = Seq((1L, ts(0), Some(10.0)), (1L, ts(0, 5), None))
      .toDF("user_id", "ts", "value")
    val out = Resample.gapFillResample(df, Seq("user_id"), "ts", "value", step)
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 5.0, "SUM skips null, COUNT does not")
  }

  test("gapReport: longest empty run and empty-bucket accounting") {
    // obs days: 0, 1, 5, 6, 7, 20 -> empty 2,3,4 (run 3) and 8..19 (run 12)
    val df = (Seq(0, 1, 5, 6, 7, 20).map(d => (1L, ts(d))) :+ (2L -> ts(3)))
      .toDF("user_id", "ts")
    val rep = Resample.gapReport(df, Seq("user_id"), "ts", step)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val d0 = 1704067200L / step
    assert(rep(1L) == ((d0, d0 + 20, 6L, 15L, 12L)))
    assert(rep(2L) == ((d0 + 3, d0 + 3, 1L, 0L, 0L)))
  }
}
