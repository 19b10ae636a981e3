package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/**
 * Go strconv.FormatFloat('g',-1,64) parity — the float rendering
 * behind %v, canonical hash strings, and the CSV/XML sinks.
 */
class GoFloatFormatSpec extends AnyFunSuite {

  test("fixed cases match Go output") {
    val cases = Seq(
      0.0 -> "0", 1.0 -> "1", -1.0 -> "-1", 100.0 -> "100",
      1.5 -> "1.5", 123.45 -> "123.45", -0.25 -> "-0.25",
      0.001 -> "0.001", 0.0001 -> "0.0001",
      0.00001 -> "1e-05", // decExp -5 < -4 -> exponent form
      // Go strconv ftoa_test.go vectors: shortest 'g' switches to
      // exponent form at decExp >= 6 (eprec=6), not 21.
      100000.0 -> "100000", 200000.0 -> "200000",
      1000000.0 -> "1e+06", 2000000.0 -> "2e+06",
      1234567.0 -> "1.234567e+06", 123456.7 -> "123456.7",
      1e20 -> "1e+20",
      1e21 -> "1e+21",
      1.23e22 -> "1.23e+22", // JDK17 Double.toString says 1.2300000000000001E22; Go (shortest) says 1.23e+22
      6.02e-23 -> "6.02e-23",
      Double.NaN -> "NaN",
      Double.PositiveInfinity -> "+Inf",
      Double.NegativeInfinity -> "-Inf")
    cases.foreach { case (in, want) =>
      assert(GoFloatFormat.format(in) == want, s"format($in)")
    }
  }

  test("property: output round-trips to the same double (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 5000).foreach { _ =>
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.between(-25, 25))
      val s = GoFloatFormat.format(d)
      assert(s.toDouble == d, s"round-trip $d via '$s'")
    }
  }

  test("property: integral doubles render as plain integers under 1e6") {
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val n = rnd.between(-999999L, 1000000L)
      assert(GoFloatFormat.format(n.toDouble) == n.toString)
    }
  }
}
