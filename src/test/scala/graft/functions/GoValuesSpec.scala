package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANSI-safety and ParseFloat-parity edges of the Go coercion columns. */
class GoValuesSpec extends SparkTestBase {

  private def one[T](c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect().head.get(0)
  }

  test("goToInt: 2^63 float input yields null instead of an ANSI cast crash") {
    // Long.MaxValue.toDouble rounds UP to 2^63 — exactly the value a
    // between() guard admits and a plain ANSI cast throws on
    // (transform.go:979 fails its round-trip check there too -> error).
    assert(one(GoValues.goToInt(lit(9.223372036854776e18d), DoubleType)) == null)
    assert(one(GoValues.goToInt(lit("9223372036854775808"), StringType)) == null)
    assert(one(GoValues.goToInt(lit(12.0d), DoubleType)) == 12L)
    assert(one(GoValues.goToInt(lit(12.5d), DoubleType)) == null) // non-integral
  }

  test("goToFloat: Go ParseFloat inf/nan spellings accepted") {
    assert(one(GoValues.goToFloat(lit("inf"), StringType)) == Double.PositiveInfinity)
    assert(one(GoValues.goToFloat(lit(" -Inf "), StringType)) == Double.NegativeInfinity)
    assert(one(GoValues.goToFloat(lit("INFINITY"), StringType)) == Double.PositiveInfinity)
    assert(one(GoValues.goToFloat(lit("nan"), StringType)).asInstanceOf[Double].isNaN)
    assert(one(GoValues.goToFloat(lit("1.5"), StringType)) == 1.5)
    assert(one(GoValues.goToFloat(lit("bogus"), StringType)) == null)
  }
}
