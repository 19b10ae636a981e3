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
    // Go's special() allows a sign only before inf/infinity — "+nan"
    // is NOT a valid ParseFloat input (and Spark's try_cast agrees)
    assert(one(GoValues.goToFloat(lit("+nan"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("-nan"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("1.5"), StringType)) == 1.5)
    assert(one(GoValues.goToFloat(lit("bogus"), StringType)) == null)
  }

  test("goToFloat: Go ParseFloat hex floats") {
    assert(one(GoValues.goToFloat(lit("0x1p3"), StringType)) == 8.0)
    assert(one(GoValues.goToFloat(lit("0x1.8p1"), StringType)) == 3.0)
    assert(one(GoValues.goToFloat(lit("-0x.8p0"), StringType)) == -0.5)
    assert(one(GoValues.goToFloat(lit("0X10P-1"), StringType)) == 8.0)
    assert(one(GoValues.goToFloat(lit("0x1f"), StringType)) == null)  // p-exp mandatory
    assert(one(GoValues.goToFloat(lit("0xp3"), StringType)) == null)  // no mantissa digits
  }

  test("goToFloat: Go literal digit underscores (between digits only)") {
    assert(one(GoValues.goToFloat(lit("1_000"), StringType)) == 1000.0)
    assert(one(GoValues.goToFloat(lit("1_000.000_1"), StringType)) == 1000.0001)
    assert(one(GoValues.goToFloat(lit("1_0e1_0"), StringType)) == 1e11)
    assert(one(GoValues.goToFloat(lit("0x_1p3"), StringType)) == 8.0) // after base prefix ok
    assert(one(GoValues.goToFloat(lit("_1000"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("1000_"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("1__000"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("1_.5"), StringType)) == null)  // not between digits
  }

  test("goToFloat: Go ErrRange parity — overflow and underflow are errors") {
    assert(one(GoValues.goToFloat(lit("1e999"), StringType)) == null)   // overflow
    assert(one(GoValues.goToFloat(lit("-1e999"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("1e-999"), StringType)) == null)  // underflow
    assert(one(GoValues.goToFloat(lit("0x1p99999"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("0x1p-99999"), StringType)) == null)
    assert(one(GoValues.goToFloat(lit("0e99"), StringType)) == 0.0)     // true zero ok
    assert(one(GoValues.goToFloat(lit("0.0"), StringType)) == 0.0)
    assert(one(GoValues.goToFloat(lit("inf"), StringType)) == Double.PositiveInfinity)
  }

  test("goToInt: ParseFloat fallback inherits underscore/hex forms") {
    assert(one(GoValues.goToInt(lit("1_000"), StringType)) == 1000L)
    assert(one(GoValues.goToInt(lit("0x1p3"), StringType)) == 8L)
    assert(one(GoValues.goToInt(lit("0x1.8p1"), StringType)) == 3L)   // 3.0 is integral
    assert(one(GoValues.goToInt(lit("0x1.4p1"), StringType)) == null) // 2.5 is not
  }
}
