package graft.ops

import graft.SparkTestBase

/** Kaplan-Meier: risk sets, censoring, ln-micro steps. */
class SurvivalSpec extends SparkTestBase {

  test("kaplanMeier: closed-form risk sets with censoring; extinction row semantics") {
    import spark.implicits._
    // subjects: event@1, event@2, censored@2, event@3
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1)).toDF("dur", "ev")
    val got = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5))).toMap
    def lnMicro(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    // t=1: 4 at risk, 1 event -> ln(3/4)
    assert(got(1L) == ((4L, 1L, 0L, Some(lnMicro(3.0 / 4)), lnMicro(3.0 / 4))))
    // t=2: 3 at risk, 1 event + 1 censored -> ln(2/3); cumulative adds
    assert(got(2L) == ((3L, 1L, 1L, Some(lnMicro(2.0 / 3)),
      lnMicro(3.0 / 4) + lnMicro(2.0 / 3))))
    // t=3: 1 at risk, 1 event -> survival hits 0: NULL step, ln_surv = S(t-)
    assert(got(3L) == ((1L, 1L, 0L, None, lnMicro(3.0 / 4) + lnMicro(2.0 / 3))))
    assert(got.size == 3)
  }

  test("kaplanMeier: censor-only durations produce no step rows but shrink later risk sets") {
    import spark.implicits._
    // censored@1 leaves the t=2 risk set: 2 at risk of 3 subjects
    val df = Seq((1L, 0), (2L, 1), (3L, 0)).toDF("dur", "ev")
    val got = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(2L -> ((2L, 1L))))
  }
}
