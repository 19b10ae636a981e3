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

  test("churnLabels: feature window only feeds features, label window only feeds the label") {
    import spark.implicits._
    val df = Seq(
      // u1: active in features (day 1-2), silent in last 7 days -> churned
      (1L, ts(1), 10.0, "a"), (1L, ts(2), 5.0, "b"),
      // u2: active early AND on day 30 -> not churned
      (2L, ts(3), 1.0, "a"), (2L, ts(30), 2.0, "a"),
      // u3: appears ONLY after the 20-day feature window -> excluded
      (3L, ts(25), 9.0, "a"),
      // u4 pins corpus min/max edges
      (4L, ts(1), 0.5, "a"), (4L, ts(30), 0.5, "a")
    ).toDF("user_id", "ts", "value", "event_type")
    val got = Rfm.churnLabels(df, "user_id", "ts", "value", "event_type",
        featureDays = 20, labelDays = 7)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("frequency"), r.getAs[Double]("monetary"),
          r.getAs[Long]("n_event_types"), r.getAs[Long]("last_seen_day"),
          r.getAs[Boolean]("churned"))).toMap
    assert(got(1L) == ((2L, 15.0, 2L, 1L, true)))
    assert(got(2L) == ((1L, 1.0, 1L, 2L, false))) // day-30 event NOT in features
    assert(!got.contains(3L))
    assert(got(4L)._5 == false)
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
