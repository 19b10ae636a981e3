package graft.expr

import scala.collection.mutable.ArrayBuffer

/**
 * govaluate-expression → Spark SQL translator.
 *
 * The reference evaluates govaluate v3 expressions per record for the
 * pipeline `filter` (/root/reference/internal/app/app.go:151-163) and
 * for `branch` transform conditions (internal/transform/
 * transform.go:288-298). We translate the expression ONCE at playbook
 * compile time into a Spark SQL string for `expr(...)`, so the
 * predicate stays inside Catalyst (pushdown + codegen) instead of a
 * per-row interpreter.
 *
 * Grammar per the public govaluate spec: ternary `?:` / `??`, `|| &&`,
 * comparisons `== != < > <= >= =~ !~ IN`, bitwise `| ^ & << >>`,
 * additive, multiplicative, `**`, prefix `- ! ~`; single/double-quoted
 * strings; parenthesized lists for IN.
 */
object Goval {

  sealed trait Tok
  case class Num(v: String)   extends Tok
  case class Str(v: String)   extends Tok
  case class Ident(v: String) extends Tok
  case class Op(v: String)    extends Tok

  case class TranslationResult(sql: String, identifiers: Set[String])

  /**
   * govaluate date literals (parsing.go `tryParseTime`): any string
   * literal parseable in one of its time layouts becomes a float64 of
   * unix SECONDS at parse time, in every context — `'2014-01-02'` is
   * the number 1388620800, and `stringField == '2014-01-02'` is
   * constant-false (string never DeepEquals float64). Covers the
   * zone-less and numeric-offset layouts AND the abbreviated-zone
   * layouts (UnixDate/RFC822/RFC850/RFC1123): Go binds an MST-token
   * abbreviation to offset 0 unless it names the process-local zone,
   * and the reference containers run UTC — so both branches mean UTC
   * and we strip the abbreviation and parse zone-less (two-digit years
   * widen with Go's 69→19xx / 68→20xx pivot). Zone-less layouts are
   * pinned to UTC (govaluate uses the process-local zone).
   */
  private[expr] def tryParseTime(s: String): Option[Long] = {
    import java.time._
    import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
    import java.time.temporal.ChronoField._
    def f(pattern: String): DateTimeFormatter =
      new DateTimeFormatterBuilder().appendPattern(pattern)
        .parseDefaulting(YEAR, 0).parseDefaulting(MONTH_OF_YEAR, 1)
        .parseDefaulting(DAY_OF_MONTH, 1).parseDefaulting(HOUR_OF_DAY, 0)
        .parseDefaulting(MINUTE_OF_HOUR, 0).parseDefaulting(SECOND_OF_MINUTE, 0)
        .toFormatter(java.util.Locale.US)
    // RFC3339 / RFC3339Nano: optional fraction, 'Z' or ±hh:mm offset
    val rfc3339 = new DateTimeFormatterBuilder()
      .appendPattern("uuuu-MM-dd'T'HH:mm:ss")
      .appendFraction(NANO_OF_SECOND, 0, 9, true)
      .appendPattern("XXX").toFormatter(java.util.Locale.US)
    val layouts: Seq[DateTimeFormatter] = Seq(
      f("uuuu-MM-dd"),                       // "2006-01-02"
      f("uuuu-MM-dd HH:mm"),                 // "2006-01-02 15:04"
      f("uuuu-MM-dd HH:mm:ss"),              // "2006-01-02 15:04:05"
      f("uuuu-MM-dd HH:mm:ssXXX"),           // "... -07:00"
      rfc3339,                               // RFC3339 / RFC3339Nano
      f("uuuu-MM-dd'T'HHXX"),                // ISO8601 hour, Z0700
      f("uuuu-MM-dd'T'HH:mmXX"),             // ISO8601 minutes, Z0700
      f("uuuu-MM-dd'T'HH:mm:ssXX"),          // ISO8601 seconds, Z0700
      new DateTimeFormatterBuilder().appendPattern("uuuu-MM-dd'T'HH:mm:ss")
        .appendFraction(NANO_OF_SECOND, 0, 9, true)
        .appendPattern("XX").toFormatter(java.util.Locale.US), // ISO8601 nanos, Z0700
      f("h:mma"),                            // Kitchen "3:04PM" (Go year-0 date)
      f("EEE MMM dd HH:mm:ss xx uuuu"),      // RubyDate
      f("EEE MMM ppd HH:mm:ss uuuu"))        // ANSIC (space-padded day)
    // Abbreviated-zone layouts: strip the zone token (Go offset-0
    // binding → UTC here), widen 2-digit years with Go's 69/99 pivot.
    def year4(yy: String): String = {
      val y = yy.toInt
      (if (y >= 69) 1900 + y else 2000 + y).toString
    }
    val Zab = "[A-Z]{3,5}"
    val unixDate = s"^([A-Za-z]{3} [A-Za-z]{3} (?: \\d|\\d{1,2}) \\d{2}:\\d{2}:\\d{2}) $Zab (\\d{4})$$".r
    val rfc822   = s"^(\\d{2} [A-Za-z]{3} )(\\d{2})( \\d{2}:\\d{2}) $Zab$$".r
    val rfc850   = s"^([A-Za-z]+, \\d{2}-[A-Za-z]{3}-)(\\d{2})( \\d{2}:\\d{2}:\\d{2}) $Zab$$".r
    val rfc1123  = s"^([A-Za-z]{3}, \\d{2} [A-Za-z]{3} \\d{4} \\d{2}:\\d{2}:\\d{2}) $Zab$$".r
    val abbrevStripped: Option[(String, DateTimeFormatter)] = s match {
      case unixDate(dt, yr) => Some((s"$dt $yr", f("EEE MMM ppd HH:mm:ss uuuu")))
      case rfc1123(dt)      => Some((dt, f("EEE, dd MMM uuuu HH:mm:ss")))
      case rfc850(a, yy, b) => Some((s"$a${year4(yy)}$b", f("EEEE, dd-MMM-uuuu HH:mm:ss")))
      case rfc822(a, yy, b) => Some((s"$a${year4(yy)}$b", f("dd MMM uuuu HH:mm")))
      case _                => None
    }
    def epochOf(fmt: DateTimeFormatter, str: String): Option[Long] =
      try {
        val ta = fmt.parse(str)
        val ldt = LocalDateTime.from(ta)
        val off = if (ta.isSupported(OFFSET_SECONDS)) ZoneOffset.from(ta) else ZoneOffset.UTC
        Some(ldt.toEpochSecond(off))
      } catch { case _: Exception => None }
    abbrevStripped.flatMap { case (str, fmt) => epochOf(fmt, str) }
      .orElse(layouts.view.flatMap(fmt => epochOf(fmt, s)).headOption)
  }

  def tokenize(s: String): List[Tok] = {
    val out = ArrayBuffer[Tok]()
    var i = 0
    val n = s.length
    val twoCharOps = Set("==", "!=", "<=", ">=", "&&", "||", "=~", "!~", "**", "<<", ">>", "??")
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val q = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else { sb.append(s.charAt(i)); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(s"unterminated string in expression: $s")
        i += 1
        out += Str(sb.toString)
      } else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
          s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
          ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > start &&
            (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')) ||
          s.charAt(i) == 'x' || (s.charAt(i) >= 'a' && s.charAt(i) <= 'f' && s.substring(start).startsWith("0x")) ||
          (s.charAt(i) >= 'A' && s.charAt(i) <= 'F' && s.substring(start).startsWith("0x")))) i += 1
        out += Num(s.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        out += Ident(s.substring(start, i))
      } else if (c == '[') {
        // govaluate escaped identifier: [field name with spaces]
        val end = s.indexOf(']', i)
        if (end == -1) throw new IllegalArgumentException(s"unterminated [identifier] in: $s")
        out += Ident(s.substring(i + 1, end).trim)
        i = end + 1
      } else if (i + 1 < n && twoCharOps.contains(s.substring(i, i + 2))) {
        out += Op(s.substring(i, i + 2)); i += 2
      } else {
        out += Op(c.toString); i += 1
      }
    }
    out.toList
  }

  /**
   * Translate to a Spark SQL expression string.
   *
   * @param stringTyped identifier → true when the column is known to be
   *   a string (so `+` renders as CONCAT, matching govaluate's
   *   string-concat `+`); unknown identifiers assumed non-string.
   * @param timestampTyped identifier → Some(flavor) when the column is
   *   datetime-typed ("timestamp" | "timestamp_ntz" | "date"). In a
   *   comparison against a govaluate date LITERAL the column stays
   *   BARE and the literal renders as a typed timestamp
   *   (`TIMESTAMP_SECONDS(n)` constant-folds to a literal the parquet
   *   scan can push down); in any other context the column renders as
   *   `to_unix_timestamp(col)` — the same epoch-seconds scale the
   *   literals use. Extension beyond the reference: its sources never
   *   produce typed timestamps (strings/numbers only), so this case is
   *   new surface introduced by the typed (parquet) sources.
   * @param rename identifier rewriting (e.g. branch's `inputValue` →
   *   the source column).
   */
  def translate(expression: String,
                stringTyped: String => Boolean = _ => false,
                rename: String => String = identity,
                timestampTyped: String => Option[String] = _ => None): TranslationResult = {
    val toks = tokenize(expression)
    val idents = scala.collection.mutable.Set[String]()
    var pos = 0

    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = {
      if (pos >= toks.length)
        throw new IllegalArgumentException(s"unexpected end of expression: $expression")
      val t = toks(pos); pos += 1; t
    }
    def expect(op: String): Unit = next() match {
      case Op(`op`) => ()
      case t => throw new IllegalArgumentException(s"expected '$op', got $t in: $expression")
    }

    // Rendered SQL + stringness: `isString` says the subexpression is
    // string-typed; `known` says we positively know its type either way
    // (literals, declared stringTyped columns, operator results).
    // Unknown identifiers carry known=false so type-based rewrites
    // never fire on a guess. `tsCol` carries a datetime column's bare
    // SQL + flavor and `dateLit` a date literal's epoch seconds so a
    // comparison between them can render pushdown-friendly.
    case class R(sql: String, isString: Boolean, known: Boolean = true,
                 tsCol: Option[(String, String)] = None,
                 dateLit: Option[Long] = None)

    /** Typed timestamp literal — TIMESTAMP_SECONDS is foldable, so the
      * optimizer sees a plain literal and the scan can push the filter. */
    def tsLit(flavor: String, secs: Long): String = flavor match {
      case "timestamp_ntz" => s"CAST(TIMESTAMP_SECONDS($secs) AS TIMESTAMP_NTZ)"
      case "date"          => s"CAST(TIMESTAMP_SECONDS($secs) AS DATE)"
      case _               => s"TIMESTAMP_SECONDS($secs)"
    }

    /** Operand pair for a comparison: a datetime column meeting a date
      * literal compares natively (bare column vs typed literal). */
    def tsPair(l: R, r: R): Option[(String, String)] = (l, r) match {
      case (R(_, _, _, Some((sql, fl)), _), R(_, _, _, _, Some(secs))) =>
        Some((sql, tsLit(fl, secs)))
      case (R(_, _, _, _, Some(secs)), R(_, _, _, Some((sql, fl)), _)) =>
        Some((tsLit(fl, secs), sql))
      case _ => None
    }

    def sqlStr(v: String): String = "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

    /**
     * Numeric operation with a string-typed side: govaluate ERRORS
     * per-record on type mismatch (no coercion), and the pipeline
     * routes eval-errors to the error channel. TRY_CAST gives exactly
     * that shape row-by-row — parseable strings compare numerically,
     * garbage turns the predicate NULL (-> error record) instead of an
     * ANSI runtime exception killing the job.
     */
    def numericize(x: R, other: R): String =
      if (x.isString && !other.isString) s"TRY_CAST(${x.sql} AS DOUBLE)" else x.sql

    def primary(): R = next() match {
      case Num(v)   => R(v, isString = false)
      case Str(v)   => tryParseTime(v) match {
        // govaluate tokenizer: date-parseable string → float64 unix seconds
        case Some(secs) => R(secs.toString, isString = false, dateLit = Some(secs))
        case None       => R(sqlStr(v), isString = true)
      }
      case Ident("true")  => R("true", isString = false)
      case Ident("false") => R("false", isString = false)
      case Ident(name) =>
        val renamed = rename(name)
        idents += renamed
        val quoted = renamed.split('.').map(p => s"`$p`").mkString(".")
        timestampTyped(renamed) match {
          case Some(flavor) =>
            // epoch seconds, the same scale govaluate date literals use;
            // tsCol lets comparisons swap in the pushdown-friendly form
            R(s"to_unix_timestamp($quoted)", isString = false, known = true,
              tsCol = Some((quoted, flavor)))
          case None =>
            // stringTyped=false can mean "non-string" OR "not in the
            // schema map" — only a positive answer is knowledge.
            val isStr = stringTyped(renamed)
            R(quoted, isStr, known = isStr)
        }
      case Op("(") =>
        val e = ternary()
        peek match {
          case Some(Op(",")) =>
            // list literal (IN right-hand side)
            val items = ArrayBuffer(e.sql)
            while (peek.contains(Op(","))) { next(); items += ternary().sql }
            expect(")")
            R(items.mkString("(", ", ", ")"), isString = false)
          case _ => expect(")")
            R(s"(${e.sql})", e.isString, e.known, tsCol = e.tsCol, dateLit = e.dateLit)
        }
      case Op("-") => val e = unary(); R(s"(- ${e.sql})", isString = false)
      case Op("!") => val e = unary(); R(s"(NOT ${e.sql})", isString = false)
      case Op("~") => val e = unary(); R(s"(~ ${e.sql})", isString = false)
      case t => throw new IllegalArgumentException(s"unexpected token $t in: $expression")
    }

    // prefix - ! ~ are consumed inside primary()
    def unary(): R = primary()

    def power(): R = {
      var l = unary()
      while (peek.contains(Op("**"))) { next(); val r = unary(); l = R(s"POWER(${l.sql}, ${r.sql})", isString = false) }
      l
    }

    def mul(): R = {
      var l = power()
      var go = true
      while (go) peek match {
        case Some(Op(o @ ("*" | "/" | "%"))) => next(); val r = power()
          l = R(s"(${numericize(l, r)} $o ${numericize(r, l)})", isString = false)
        case _ => go = false
      }
      l
    }

    def add(): R = {
      var l = mul()
      var go = true
      while (go) peek match {
        case Some(Op("+")) =>
          next(); val r = mul()
          l = if (l.isString || r.isString) R(s"CONCAT(${l.sql}, ${r.sql})", isString = true)
              else R(s"(${l.sql} + ${r.sql})", isString = false)
        case Some(Op("-")) => next(); val r = mul()
          l = R(s"(${numericize(l, r)} - ${numericize(r, l)})", isString = false)
        case _ => go = false
      }
      l
    }

    def shift(): R = {
      var l = add()
      var go = true
      while (go) peek match {
        case Some(Op("<<")) => next(); val r = add(); l = R(s"SHIFTLEFT(${l.sql}, ${r.sql})", isString = false)
        case Some(Op(">>")) => next(); val r = add(); l = R(s"SHIFTRIGHT(${l.sql}, ${r.sql})", isString = false)
        case _ => go = false
      }
      l
    }

    def bitwise(): R = {
      var l = shift()
      var go = true
      while (go) peek match {
        case Some(Op(o @ ("&" | "|" | "^"))) => next(); val r = shift(); l = R(s"(${l.sql} $o ${r.sql})", isString = false)
        case _ => go = false
      }
      l
    }

    def comparison(): R = {
      var l = bitwise()
      var go = true
      // govaluate v3 equality (evaluationStage.go equalStage) is
      // reflect.DeepEqual with NO type coercion and NO type check:
      // '5' == 5 is simply false (a string never DeepEquals a float64).
      // SQL `=` would coerce ('5' = 5 → true), so when both sides'
      // types are positively known and their stringness differs we fold
      // the comparison to its constant govaluate result.
      def strictEq(a: R, b: R): Boolean = a.known && b.known && a.isString != b.isString
      while (go) peek match {
        case Some(Op("==")) => next(); val r = bitwise()
          l = if (strictEq(l, r)) R("false", isString = false)
              else tsPair(l, r) match {
                case Some((ls, rs)) => R(s"($ls = $rs)", isString = false)
                case None => R(s"(${l.sql} = ${r.sql})", isString = false)
              }
        case Some(Op("!=")) => next(); val r = bitwise()
          l = if (strictEq(l, r)) R("true", isString = false)
              else tsPair(l, r) match {
                case Some((ls, rs)) => R(s"($ls <> $rs)", isString = false)
                case None => R(s"(${l.sql} <> ${r.sql})", isString = false)
              }
        case Some(Op(o @ ("<" | ">" | "<=" | ">="))) => next(); val r = bitwise()
          l = tsPair(l, r) match {
            case Some((ls, rs)) => R(s"($ls $o $rs)", isString = false)
            case None => R(s"(${numericize(l, r)} $o ${numericize(r, l)})", isString = false)
          }
        case Some(Op("=~")) => next(); val r = bitwise(); l = R(s"(${l.sql} RLIKE ${r.sql})", isString = false)
        case Some(Op("!~")) => next(); val r = bitwise(); l = R(s"(NOT (${l.sql} RLIKE ${r.sql}))", isString = false)
        case Some(Ident(kw)) if kw.equalsIgnoreCase("in") =>
          next(); val r = bitwise(); l = R(s"(${l.sql} IN ${r.sql})", isString = false)
        case _ => go = false
      }
      l
    }

    def and(): R = {
      var l = comparison()
      while (peek.contains(Op("&&"))) { next(); val r = comparison(); l = R(s"(${l.sql} AND ${r.sql})", isString = false) }
      l
    }

    def or(): R = {
      var l = and()
      while (peek.contains(Op("||"))) { next(); val r = and(); l = R(s"(${l.sql} OR ${r.sql})", isString = false) }
      l
    }

    def ternary(): R = {
      val c = or()
      peek match {
        case Some(Op("?")) =>
          next(); val a = ternary()
          expect(":")
          val b = ternary()
          R(s"IF(${c.sql}, ${a.sql}, ${b.sql})", a.isString || b.isString,
            known = a.known && b.known && a.isString == b.isString)
        case Some(Op("??")) =>
          next(); val b = ternary()
          R(s"COALESCE(${c.sql}, ${b.sql})", c.isString || b.isString,
            known = c.known && b.known && c.isString == b.isString)
        case _ => c
      }
    }

    val result = ternary()
    if (pos != toks.length)
      throw new IllegalArgumentException(s"trailing tokens after position $pos in: $expression")
    TranslationResult(result.sql, idents.toSet)
  }
}
