package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Replicates Go's `strconv.FormatFloat(v, 'g', -1, 64)` — the float
 * rendering used by `fmt.Sprintf("%v")` and by the reference's
 * canonical hash stringification (/root/reference/internal/transform/
 * transform.go:585-590) and CSV/XML sink value formatting
 * (internal/io/csv.go:253, xml.go:220).
 *
 * Both Java and Go produce the SHORTEST digit string that round-trips
 * the exact double; they differ only in surface form (Java "1.0E6" vs
 * Go "1e+06"). We reuse Java's shortest digits and re-render with Go's
 * rules: exponent form when decExp < -4 || decExp >= 21, lowercase
 * 'e', signed 2-digit exponent, no trailing ".0".
 */
object GoFloatFormat {

  def format(v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v == Double.PositiveInfinity) return "+Inf"
    if (v == Double.NegativeInfinity) return "-Inf"
    val s = java.lang.Double.toString(v) // shortest round-trip
    val neg = s.startsWith("-")
    val body = if (neg) s.substring(1) else s
    val (mant, e) = body.indexOf('E') match {
      case -1 => (body, 0)
      case i  => (body.substring(0, i), body.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val intPart = if (dot == -1) mant else mant.substring(0, dot)
    val fracPart = if (dot == -1) "" else mant.substring(dot + 1)
    var digits = intPart + fracPart
    // exponent (base 10) of the first digit of `digits`
    var decExp = intPart.length + e - 1
    // strip leading zeros (e.g. "0.001" -> digits "0001")
    val lead = digits.indexWhere(_ != '0')
    if (lead == -1) { // value is zero
      return if (neg) "-0" else "0"
    }
    decExp -= lead
    digits = digits.substring(lead)
    // strip trailing zeros ("1.0" -> "10" -> "1")
    digits = digits.replaceAll("0+$", "")
    if (digits.isEmpty) digits = "0"

    val sb = new StringBuilder(if (neg) "-" else "")
    if (decExp < -4 || decExp >= 21) {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      sb.append('e').append(if (decExp >= 0) '+' else '-')
      val ae = math.abs(decExp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (decExp >= digits.length - 1) {
      sb.append(digits).append("0" * (decExp - (digits.length - 1)))
    } else if (decExp >= 0) {
      sb.append(digits.substring(0, decExp + 1)).append('.').append(digits.substring(decExp + 1))
    } else {
      sb.append("0.").append("0" * (-decExp - 1)).append(digits)
    }
    sb.toString
  }

  private val goFormatUdf = udf((v: java.lang.Double) =>
    if (v == null) null else format(v))

  /** Column form. Null-safe (null → null). */
  def goFormat(c: Column): Column = goFormatUdf(c)
}
