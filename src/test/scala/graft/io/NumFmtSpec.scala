package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** Display-format parity for styled xlsx cells (xlsx.go:150-156 reads
  * FORMATTED values via excelize GetCellValue; codes per ECMA-376 §18.8.30). */
class NumFmtSpec extends AnyFunSuite {

  private def serial(d: LocalDate): Double =
    ChronoUnit.DAYS.between(LocalDate.of(1899, 12, 30), d).toDouble

  private val jan2 = serial(LocalDate.of(2006, 1, 2))

  test("builtin date codes") {
    assert(NumFmt.format(jan2, NumFmt.builtin(14)) == "01-02-06")   // mm-dd-yy
    assert(NumFmt.format(jan2, NumFmt.builtin(15)) == "2-Jan-06")   // d-mmm-yy
    assert(NumFmt.format(jan2, NumFmt.builtin(16)) == "2-Jan")      // d-mmm
    assert(NumFmt.format(jan2, NumFmt.builtin(17)) == "Jan-06")     // mmm-yy
    assert(NumFmt.format(jan2 + 0.5, NumFmt.builtin(22)) == "1/2/06 12:00")
  }

  test("custom date code and time-of-day") {
    assert(NumFmt.format(jan2, "yyyy-mm-dd") == "2006-01-02")
    assert(NumFmt.format(jan2 + 0.75, "h:mm AM/PM") == "6:00 PM")
    assert(NumFmt.format(jan2 + 0.75, "hh:mm:ss") == "18:00:00")
    assert(NumFmt.format(1.5, "[h]:mm:ss") == "36:00:00") // elapsed hours
  }

  test("pre-1900-03-01 serials skip the phantom leap day") {
    assert(NumFmt.format(1.0, "yyyy-mm-dd") == "1900-01-01")
    assert(NumFmt.format(59.0, "yyyy-mm-dd") == "1900-02-28")
    assert(NumFmt.format(61.0, "yyyy-mm-dd") == "1900-03-01")
  }

  test("percent, fixed, thousands, scientific") {
    assert(NumFmt.format(0.125, "0%") == "13%")        // half-up
    assert(NumFmt.format(0.125, "0.00%") == "12.50%")
    assert(NumFmt.format(2.0, "0.00") == "2.00")
    assert(NumFmt.format(1234567.891, "#,##0.00") == "1,234,567.89")
    assert(NumFmt.format(12345.0, "0.00E+00") == "1.23E+04")
  }

  test("optional '#' fraction slots drop trailing zeros; '0' slots keep them") {
    assert(NumFmt.format(1.5, "0.##") == "1.5")
    assert(NumFmt.format(1.25, "0.##") == "1.25")
    assert(NumFmt.format(2.0, "0.##") == "2")     // all-optional fraction vanishes
    assert(NumFmt.format(1.5, "0.0#") == "1.5")
    assert(NumFmt.format(1.0, "0.0#") == "1.0")   // mandatory slot stays
    assert(NumFmt.format(1234.5, "#,##0.##") == "1,234.5")
  }

  test("negative section with parens (builtin 37-40 shape)") {
    assert(NumFmt.format(-1234.5, "#,##0 ;(#,##0)") == "(1,235)")
    assert(NumFmt.format(1234.5, "#,##0 ;(#,##0)") == "1,235 ")
  }

  test("General / text / unknown fall back to Go shortest rendering") {
    assert(NumFmt.format(2.5, "General") == "2.5")
    assert(NumFmt.format(2.0, "@") == "2")
    assert(NumFmt.format(2.0, "") == "2")
  }
}
