package graft.ops

import graft.SparkTestBase

/** Exact-moment statistics: correlation matrix + OLS fit. */
class StatsSpec extends SparkTestBase {

  test("correlationMatrix: perfect line, hand-computed pair, zero variance -> null") {
    import spark.implicits._
    // y = 2x exactly; z constant (zero variance); w hand-computable
    val df = Seq(
      (1.0, 2.0, 5.0, 1.0),
      (2.0, 4.0, 5.0, 3.0),
      (3.0, 6.0, 5.0, 2.0),
      (4.0, 8.0, 5.0, 6.0)
    ).toDF("x", "y", "z", "w")
    val got = Stats.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got.size == 6)
    assert(got(("x", "y"))._1 == 4L)
    assert(math.abs(got(("x", "y"))._2.get - 1.0) < 1e-12)
    // any pair with the constant column is null
    assert(got(("x", "z"))._2.isEmpty && got(("y", "z"))._2.isEmpty && got(("z", "w"))._2.isEmpty)
    // hand formula for (x, w): n=4 sx=10 sw=12 sxx=30 sww=50 sxw=37
    val expected = (4.0 * 37 - 10 * 12) / (math.sqrt(4.0 * 30 - 100) * math.sqrt(4.0 * 50 - 144))
    assert(math.abs(got(("x", "w"))._2.get - expected) < 1e-12)
  }

  test("correlationMatrix: a null in ANY requested column drops the row listwise") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0), Some(1.0)),
      (Some(2.0), None, Some(2.0)), // excluded from every pair, not just (x,y)
      (Some(3.0), Some(6.0), Some(3.0)),
      (Some(4.0), Some(8.0), Some(5.0))
    ).toDF("x", "y", "v")
    val got = Stats.correlationMatrix(df, Seq("x", "y", "v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.values.toSet == Set(3L)) // one shared n for all pairs
  }

  test("olsFit: exact line per group, intercept units, zero x-variance -> null") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 12.0), ("a", 2.0, 14.0), ("a", 3.0, 16.0), // y = 2x + 10
      ("b", 5.0, 1.0), ("b", 5.0, 9.0) // vertical: no fit
    ).toDF("g", "x", "y")
    val got = Stats.olsFit(df, "x", "y", Seq("g")).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val (na, slopeA, interceptA) = got("a")
    assert(na == 3L)
    assert(math.abs(slopeA.get - 2.0) < 1e-9)
    assert(math.abs(interceptA.get - 10.0) < 1e-9)
    assert(got("b")._2.isEmpty && got("b")._3.isEmpty)
  }
}
