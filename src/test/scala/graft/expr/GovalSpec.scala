package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Translator tables for the govaluate -> Spark SQL compiler (SURVEY §2.2). */
class GovalSpec extends AnyFunSuite {

  private def sql(e: String, strings: Set[String] = Set.empty): String =
    Goval.translate(e, stringTyped = strings).sql

  test("equality is strict on known type mismatch (govaluate equalStage = reflect.DeepEqual)") {
    // '5' == 5 is FALSE in govaluate v3 (a string never DeepEquals a
    // float64) — SQL '=' would coerce it to true.
    assert(sql("'5' == 5") == "false")
    assert(sql("'5' != 5") == "true")
    assert(sql("status == 5", Set("status")) == "false")
    // same-type and unknown-type comparisons keep real SQL equality
    assert(sql("status == 'O'", Set("status")) == "(`status` = 'O')")
    assert(sql("mystery == 5") == "(`mystery` = 5)")
    assert(sql("mystery == 'x'") == "(`mystery` = 'x')")
  }

  test("date literals tokenize to unix seconds (govaluate parsing.go tryParseTime)") {
    // '2014-01-02' is the NUMBER 1388620800 in govaluate, in every context
    assert(sql("ts > '2014-01-02'") == "(`ts` > 1388620800)")
    assert(sql("ts >= '2014-01-02 15:04:05'") == "(`ts` >= 1388675045)")
    assert(sql("ts < '2014-01-02T15:04:05Z'") == "(`ts` < 1388675045)")
    assert(sql("ts < '2014-01-02T15:04:05+01:00'") == "(`ts` < 1388671445)")
    // a string column compared to a date literal is a known type
    // mismatch -> constant DeepEqual result, like '5' == 5
    assert(sql("name == '2014-01-02'", Set("name")) == "false")
    // non-date strings stay strings
    assert(sql("name == '2014-13-99'", Set("name")) == "(`name` = '2014-13-99')")
    assert(sql("name == 'x2014-01-02'", Set("name")) == "(`name` = 'x2014-01-02')")
  }

  test("abbreviated-zone date literals: Go binds the zone abbrev to offset 0 (UTC)") {
    // 2014-01-02 15:04:05 UTC = 1388675045 regardless of the abbrev
    assert(sql("ts > 'Thu, 02 Jan 2014 15:04:05 MST'") == "(`ts` > 1388675045)") // RFC1123
    assert(sql("ts > 'Thu, 02 Jan 2014 15:04:05 GMT'") == "(`ts` > 1388675045)")
    assert(sql("ts > 'Thu Jan  2 15:04:05 EST 2014'") == "(`ts` > 1388675045)")  // UnixDate
    assert(sql("ts > 'Thursday, 02-Jan-14 15:04:05 UTC'") == "(`ts` > 1388675045)") // RFC850
    assert(sql("ts > '02 Jan 14 15:04 CHAST'") == "(`ts` > 1388675040)")         // RFC822
    // Go's 2-digit-year pivot: 69-99 -> 19xx
    assert(sql("ts > '02 Jan 99 15:04 MST'") == "(`ts` > 915289440)")
    // lower-case abbrevs are NOT zone tokens -> not a date literal
    assert(sql("name == '02 Jan 14 15:04 mst'", Set("name")) ==
      "(`name` = '02 Jan 14 15:04 mst')")
  }

  test("timestamp-typed identifiers: pushdown-friendly vs date literals, epoch otherwise") {
    // vs a date LITERAL: bare column against a typed foldable literal,
    // so the parquet scan can push the range filter
    val r = Goval.translate("ts >= '2014-01-02' && n > 1",
      timestampTyped = Map("ts" -> "timestamp_ntz").get)
    assert(r.sql ==
      "((`ts` >= CAST(TIMESTAMP_SECONDS(1388620800) AS TIMESTAMP_NTZ)) AND (`n` > 1))")
    val tz = Goval.translate("ts == '2014-01-02'", timestampTyped = Map("ts" -> "timestamp").get)
    assert(tz.sql == "(`ts` = TIMESTAMP_SECONDS(1388620800))")
    // vs anything else: epoch-seconds rendering
    val num = Goval.translate("ts > 1388620800", timestampTyped = Map("ts" -> "timestamp").get)
    assert(num.sql == "(to_unix_timestamp(`ts`) > 1388620800)")
  }

  test("comparison operators rewrite") {
    assert(sql("a == 1") == "(`a` = 1)")
    assert(sql("a != 1") == "(`a` <> 1)")
    assert(sql("a >= 1 && b < 2") == "((`a` >= 1) AND (`b` < 2))")
    assert(sql("a || b") == "(`a` OR `b`)")
  }

  test("regex match / not-match") {
    assert(sql("s =~ '^x'") == "(`s` RLIKE '^x')")
    assert(sql("s !~ '^x'") == "(NOT (`s` RLIKE '^x'))")
  }

  test("IN list") {
    assert(sql("a IN (1, 2, 3)") == "(`a` IN (1, 2, 3))")
    assert(sql("s in ('x', 'y')") == "(`s` IN ('x', 'y'))")
  }

  test("ternary and null-coalescing") {
    assert(sql("a > 1 ? 'big' : 'small'") == "IF((`a` > 1), 'big', 'small')")
    assert(sql("a ?? 5") == "COALESCE(`a`, 5)")
  }

  test("arithmetic, power, modulo") {
    assert(sql("a + b * 2") == "(`a` + (`b` * 2))")
    assert(sql("a ** 2") == "POWER(`a`, 2)")
    assert(sql("a % 7 == 0") == "((`a` % 7) = 0)")
  }

  test("string concat + when either side is a string") {
    assert(sql("s + '!'", strings = Set("s")) == "CONCAT(`s`, '!')")
    assert(sql("'a' + 'b'") == "CONCAT('a', 'b')")
    assert(sql("a + 1") == "(`a` + 1)")
  }

  test("unary operators") {
    assert(sql("!a") == "(NOT `a`)")
    assert(sql("-a + 1") == "((- `a`) + 1)")
  }

  test("escaped [identifier with spaces]") {
    assert(sql("[field name] == 1") == "(`field name` = 1)")
  }

  test("string escaping") {
    assert(sql("s == 'it\\'s'") == "(`s` = 'it\\'s')")
  }

  test("identifiers are collected") {
    val r = Goval.translate("(a > 1 && b.c == 'x') || d IN (1,2)")
    assert(r.identifiers == Set("a", "b.c", "d"))
  }

  test("the reference docs' example translates") {
    val r = Goval.translate(
      "(status == 'active' && amount > 0) || priority >= 10",
      stringTyped = Set("status"))
    assert(r.sql == "((((`status` = 'active') AND (`amount` > 0))) OR (`priority` >= 10))")
  }

  test("malformed expressions are rejected") {
    assertThrows[IllegalArgumentException](Goval.translate("a >"))
    assertThrows[IllegalArgumentException](Goval.translate("a == 'unterminated"))
    assertThrows[IllegalArgumentException](Goval.translate("a b"))
  }
}
