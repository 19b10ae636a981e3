package graft.expr

import org.scalatest.funsuite.AnyFunSuite

class GoTimeSpec extends AnyFunSuite {

  test("core layout tokens") {
    assert(GoTime.toJavaPattern("2006-01-02") == "yyyy-MM-dd")
    assert(GoTime.toJavaPattern("2006/01/02") == "yyyy/MM/dd")
    assert(GoTime.toJavaPattern("01/02/2006") == "MM/dd/yyyy")
    assert(GoTime.toJavaPattern("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss")
    assert(GoTime.toJavaPattern("20060102") == "yyyyMMdd")
    assert(GoTime.toJavaPattern("01-02-06") == "MM-dd-yy")
  }

  test("RFC3339 with zone") {
    assert(GoTime.toJavaPattern("2006-01-02T15:04:05Z07:00") == "yyyy-MM-dd'T'HH:mm:ssXXX")
  }

  test("12-hour clock and month names") {
    assert(GoTime.toJavaPattern("03:04 PM") == "hh:mm a")
    assert(GoTime.toJavaPattern("Jan 2, 2006") == "MMM d, yyyy")
    assert(GoTime.toJavaPattern("January") == "MMMM")
  }

  test("literal letters are quoted") {
    assert(GoTime.toJavaPattern("2006-01-02T15:04:05") == "yyyy-MM-dd'T'HH:mm:ss")
  }

  test("fallback list matches the reference's 12 layouts in order") {
    assert(GoTime.fallbackGoLayouts.size == 12)
    assert(GoTime.fallbackGoLayouts.head == "2006-01-02T15:04:05Z07:00")
    assert(GoTime.fallbackGoLayouts(1) == "2006-01-02")
    assert(GoTime.fallbackGoLayouts.last == "20060102")
  }
}
