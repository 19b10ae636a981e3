package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Go-semantics value coercion, re-expressed as Catalyst `Column`
 * expressions (codegen-friendly builtins — no UDFs on the hot path).
 *
 * Reference semantics (cited from /root/reference):
 *  - parseValueAsInt64  internal/transform/transform.go:945-1002 —
 *    ints pass; floats convert ONLY if integral; strings parse as int,
 *    else float-then-integral-check; never truncates.
 *  - parseValueAsFloat64 transform.go:1005-1030 — numerics widen;
 *    strings ParseFloat after trim; empty string fails.
 *  - toBool              transform.go:426-463 — nil→false; bool id;
 *    string sets; numeric != 0.
 *  - ValueToStringForHash transform.go:574-604 — canonical strings.
 */
object GoValues {

  private val intRe = "^[+-]?[0-9]+$"

  /**
   * Double→Long cast that can never overflow OR saturate. ANSI cast's
   * own range check compares `floor(d) <= Long.MaxValue` in double
   * arithmetic, where MaxValue promotes to exactly 2^63 — so input
   * exactly 9223372036854775808.0 passes the check and SATURATES to
   * MaxValue (try_cast sees no error to suppress). Guard strictly:
   * valid doubles are [-2^63, 2^63) (−2^63 is exact; 2^63 is not a Long).
   */
  def safeLongCast(d: Column): Column =
    when(d >= Long.MinValue.toDouble && d < 9.223372036854776e18, d.try_cast(LongType))

  /** Go parseValueAsInt64 as a Column: result is LongType or null. */
  def goToInt(c: Column, dt: DataType): Column = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
      c.cast(LongType)
    case _: FloatType | _: DoubleType | _: DecimalType =>
      // integral floats only (transform.go:979: float64(int64(v)) == v);
      // Go's int64(v) round-trip check fails outside Long range too.
      val d = c.cast(DoubleType)
      when(d.isNotNull && d === floor(d), safeLongCast(d))
    case _: StringType =>
      // Go: ParseInt(s, 10, 64) first (base 10 — NO underscores), then
      // the ParseFloat fallback, which DOES accept underscores and hex
      // floats — route it through goToFloat for identical semantics.
      val t = trim(c)
      val asLong = when(t.rlike(intRe), t.try_cast(LongType))
      val d = goToFloat(c, dt)
      val viaFloat = when(d.isNotNull && d === floor(d), safeLongCast(d))
      coalesce(asLong, viaFloat)
    case _: BooleanType => lit(null).cast(LongType) // Go: bool not accepted (transform.go:999)
    case _ => lit(null).cast(LongType)
  }

  /** Go parseValueAsFloat64 as a Column: DoubleType or null. */
  def goToFloat(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DoubleType)
    case _: StringType  =>
      // Go strconv.ParseFloat after TrimSpace (transform.go:1018):
      // special literals (±inf/±infinity/nan, signed nan rejected),
      // digit underscores, hex floats, and ErrRange (overflow /
      // nonzero-mantissa underflow) treated as unparseable → null.
      // Implemented as the native [[graft.expr.GoParseFloat]]
      // expression: the equivalent Column tree inlined the trimmed
      // source and its try_cast ~30× inside CaseWhen branches — where
      // codegen subexpression elimination can't reach — and blew
      // janino's 64 KB method limit, knocking every toFloat/must*
      // projection out of whole-stage codegen (2.3 s to map 20 k rows
      // interpreted; ~0.1 s native). Semantics are a 1:1 port pinned
      // by GoValuesSpec — see [[GoFloatParse]] for the parity notes.
      Registry.ensure(org.apache.spark.sql.SparkSession.active)
      call_function("go_parse_float", c)
    case _: BooleanType => lit(null).cast(DoubleType)
    case _ => lit(null).cast(DoubleType)
  }

  /** Go toBool (transform.go:426-463): nil→false, permissive string sets. */
  def goToBool(c: Column, dt: DataType): Column = dt match {
    case _: BooleanType => coalesce(c, lit(false))
    case _: NumericType =>
      when(c.isNull, lit(false)).otherwise(c.cast(DoubleType) =!= 0.0)
    case _: StringType =>
      val s = lower(trim(c))
      when(c.isNull, lit(false))
        .when(s.isin("true", "1", "yes", "t", "y"), lit(true))
        .when(s.isin("false", "0", "no", "f", "n", ""), lit(false))
        .otherwise({
          // numeric-string branch (transform.go:452-457): parses → != 0
          val d = s.try_cast(DoubleType)
          when(d.isNotNull, d =!= 0.0) // else null (Go: error→nil value)
        })
    case _ => when(c.isNull, lit(false)) // nil→false; other types → nil
  }

  /**
   * Go mustToBool (transform.go:694-727): unlike toBool, nil and ""
   * are ERRORS, not false. Returns the value column; pair with
   * [[mustToBoolError]] for the error predicate.
   */
  def mustToBool(c: Column, dt: DataType): Column = dt match {
    case _: BooleanType => c
    case _: NumericType => c.cast(DoubleType) =!= 0.0
    case _: StringType =>
      val s = lower(trim(c))
      when(s.isin("true", "1", "yes", "t", "y"), lit(true))
        .when(s =!= "" && s.isin("false", "0", "no", "f", "n"), lit(false))
        .otherwise({
          val d = s.try_cast(DoubleType)
          when(d.isNotNull, d =!= 0.0)
        })
    case _ => lit(null).cast(BooleanType)
  }

  /**
   * Canonical stringification for hashing / dedup composite keys.
   * Go ValueToStringForHash (transform.go:574-604):
   *   nil → "<NIL>", floats strconv.FormatFloat('g',-1,64),
   *   time → RFC3339Nano UTC, ints base-10, strings identity.
   */
  def goCanonicalString(c: Column, dt: DataType): Column = {
    val s = dt match {
      case _: StringType => c
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => c.cast(StringType)
      case _: BooleanType => when(c, lit("true")).otherwise(lit("false"))
      case _: FloatType | _: DoubleType => goFormatFloat(c.cast(DoubleType))
      case _: TimestampType | _: DateType =>
        // RFC3339Nano UTC: "2006-01-02T15:04:05.999999999Z" — Go drops
        // trailing zeros in the fraction and the '.' when zero.
        rfc3339Nano(c.cast(TimestampType))
      case _ => c.cast(StringType)
    }
    when(c.isNull, lit("<NIL>")).otherwise(coalesce(s, lit("<NIL>")))
  }

  /**
   * Go `strconv.FormatFloat(v,'g',-1,64)` (used by %v and hashing),
   * built from Spark string ops on Java's shortest-round-trip repr.
   * Java emits `1.0`/`1.0E6`/`1.23E-7`; Go emits `1`/`1e+06`/`1.23e-07`.
   * Go switches to exponent form when exp < -4 or exp >= 6 (shortest
   * mode eprec=6, strconv ftoa.go).
   */
  def goFormatFloat(d: Column): Column = GoFloatFormat.goFormat(d)

  /** RFC3339Nano in UTC with Go's trailing-zero trimming. */
  def rfc3339Nano(ts: Column): Column = {
    val base = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    // microsecond precision is all Spark timestamps carry
    val frac = date_format(ts, "SSSSSS")
    val trimmed = regexp_replace(frac, "0+$", "")
    when(ts.isNull, lit(null).cast(StringType))
      .when(trimmed === "", concat(base, lit("Z")))
      .otherwise(concat(base, lit("."), trimmed, lit("Z")))
  }
}
