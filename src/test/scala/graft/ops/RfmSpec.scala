package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp

/** RFM segmentation: banding edges + segment rules on closed-form users. */
class RfmSpec extends SparkTestBase {

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("rfm: band edges, recency vs corpus max, segment labels") {
    import spark.implicits._
    // corpus max ts = day 10. u1: active today, heavy, rich -> champion.
    // u2: last seen day 8 (2 days), mid freq -> loyal.
    // u3: last seen day 1 01:00 (8 whole days before the day-10 max), freq 2 -> at_risk.
    // u4: one old event -> hibernating.
    val df = Seq(
      (1L, ts(10), 300.0), (1L, ts(9), 150.0), (1L, ts(8), 100.0),
      (2L, ts(8), 40.0), (2L, ts(7), 30.0),
      (3L, ts(1), 10.0), (3L, ts(1, 1), 5.0),
      (4L, ts(2), 1.0)
    ).toDF("user_id", "ts", "value")
    val got = Rfm.rfm(df, "user_id", "ts", "value",
        recencyDayBands = (2, 7), freqBands = (3L, 2L),
        monetaryBands = (BigDecimal(500), BigDecimal(50)))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"), r.getAs[Int]("r_score"),
          r.getAs[Int]("f_score"), r.getAs[Int]("m_score"),
          r.getAs[String]("segment"))).toMap
    assert(got(1L) == ((0L, 3L, 550.0, 3, 3, 3, "champion")))
    assert(got(2L) == ((2L, 2L, 70.0, 3, 2, 2, "loyal")))
    assert(got(3L) == ((8L, 2L, 15.0, 1, 2, 1, "at_risk")))
    assert(got(4L) == ((8L, 1L, 1.0, 1, 1, 1, "hibernating")))
  }

  test("rfm: new_or_casual covers recent-but-infrequent; monetary band edge is inclusive") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(10), 100.0), // defines corpus max; freq 1, recent
      (2L, ts(9), 500.0)   // exactly the top monetary threshold
    ).toDF("user_id", "ts", "value")
    val got = Rfm.rfm(df, "user_id", "ts", "value",
        recencyDayBands = (2, 7), freqBands = (3L, 2L),
        monetaryBands = (BigDecimal(500), BigDecimal(50)))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("m_score"), r.getAs[String]("segment"))).toMap
    assert(got(1L)._2 == "new_or_casual")
    assert(got(2L) == ((3, "new_or_casual"))) // >= is inclusive at the edge
  }
}
