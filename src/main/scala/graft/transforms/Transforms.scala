package graft.transforms

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{GoValues, GoFloatFormat}
import graft.expr.{Goval, GoTime}

/** Engine-level flags (reference: FIPS gate transform.go:25-38; frozen
  * "now" makes calculateAge testable — SURVEY §7h). */
case class EngineConfig(fipsMode: Boolean = false, nowEpoch: Option[Long] = None)

/**
 * The reference's 26-function transform registry
 * (/root/reference/internal/transform/transform.go:49-81), compiled to
 * Catalyst `Column` expressions at playbook-compile time.
 *
 * Every function returns `Out(value, error)`: `value` is the result
 * column; `error` (when present) is a StringType column that is
 * non-null iff the row fails — the pipeline's error channel
 * (SURVEY §2.6) filters/routes on it instead of throwing, which keeps
 * the whole pipeline inside whole-stage codegen.
 */
object Transforms {

  case class Ctx(
      source: Column,
      sourceType: DataType,
      sourceName: String,
      field: String => Option[(Column, DataType)],
      params: Map[String, Any],
      engine: EngineConfig = EngineConfig())

  case class Out(value: Column, error: Option[Column] = None)

  val names: Set[String] = Set(
    "toint", "tofloat", "tobool", "tostring",
    "musttoint", "musttofloat", "musttobool", "mustepochtodate", "mustdateconvert",
    "trim", "touppercase", "tolowercase", "replaceall", "substring", "regexextract",
    "epochtodate", "calculateage", "dateconvert", "multidateconvert",
    "branch", "coalesce", "hash",
    "validaterequired", "validateregex", "validatenumericrange", "validateallowedvalues")

  // ---- param helpers (snakeyaml produces java.util types) ----
  private def pStr(ctx: Ctx, k: String): Option[String] =
    ctx.params.get(k).map(_.toString)
  private def pInt(ctx: Ctx, k: String): Option[Int] = ctx.params.get(k).map {
    case n: Number => n.intValue
    case s: String => s.toInt
    case x => throw new IllegalArgumentException(s"param $k: expected int, got $x")
  }
  private def pDouble(ctx: Ctx, k: String): Option[Double] = ctx.params.get(k).map {
    case n: Number => n.doubleValue
    case s: String => s.toDouble
    case x => throw new IllegalArgumentException(s"param $k: expected number, got $x")
  }
  private def pList(ctx: Ctx, k: String): Option[Seq[Any]] = ctx.params.get(k).map {
    case l: java.util.List[_] => scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
    case l: Seq[_] => l
    case x => throw new IllegalArgumentException(s"param $k: expected list, got $x")
  }

  private def require[T](o: Option[T], what: String): T =
    o.getOrElse(throw new IllegalArgumentException(s"missing required param: $what"))

  def apply(name: String, ctx: Ctx): Out = name.toLowerCase match {
    case "toint"    => Out(GoValues.goToInt(ctx.source, ctx.sourceType))
    case "tofloat"  => Out(GoValues.goToFloat(ctx.source, ctx.sourceType))
    case "tobool"   => Out(GoValues.goToBool(ctx.source, ctx.sourceType))
    case "tostring" => Out(goToString(ctx.source, ctx.sourceType))

    case "musttoint" =>
      val v = GoValues.goToInt(ctx.source, ctx.sourceType)
      Out(v, Some(when(v.isNull,
        concat(lit(s"mustToInt: cannot convert value to integer for field '${ctx.sourceName}'")))))
    case "musttofloat" =>
      val v = GoValues.goToFloat(ctx.source, ctx.sourceType)
      Out(v, Some(when(v.isNull,
        lit(s"mustToFloat: cannot convert value to float for field '${ctx.sourceName}'"))))
    case "musttobool" =>
      val v = GoValues.mustToBool(ctx.source, ctx.sourceType)
      Out(v, Some(when(v.isNull,
        lit(s"mustToBool: cannot convert value to boolean for field '${ctx.sourceName}'"))))
    case "mustepochtodate" =>
      val parsed = epochSeconds(ctx)
      val v = date_format(to_utc_ts(parsed), "yyyy-MM-dd")
      Out(v, Some(when(v.isNull,
        lit(s"mustEpochToDate: cannot parse epoch for field '${ctx.sourceName}'"))))
    case "mustdateconvert" =>
      val ts = parseDate(ctx)
      val outFmt = GoTime.toJavaPattern(pStr(ctx, "outputFormat").getOrElse("2006-01-02T15:04:05Z07:00"))
      val v = date_format(ts, outFmt)
      Out(v, Some(when(v.isNull,
        lit(s"mustDateConvert: cannot parse date for field '${ctx.sourceName}'"))))

    case "trim" => Out(ifString(ctx)(trim(_)))
    case "touppercase" => Out(ifString(ctx)(upper(_)))
    case "tolowercase" => Out(ifString(ctx)(lower(_)))
    case "replaceall" =>
      val old = require(pStr(ctx, "old"), "replaceAll.old")
      val nw  = require(pStr(ctx, "new"), "replaceAll.new")
      // literal (non-regex) replace — transform.go:478-494
      Out(ifString(ctx)(c => replace(c, lit(old), lit(nw))))
    case "substring" =>
      // rune-based 0-based start + length with clamping (transform.go:497-531)
      val start = require(pInt(ctx, "start"), "substring.start")
      val len   = require(pInt(ctx, "length"), "substring.length")
      Out(ifString(ctx) { c =>
        if (len <= 0) lit("")
        else {
          val s = math.max(start, 0)
          // Spark substring is 1-based, codepoint-based (matches runes)
          when(length(c) <= s, lit("")).otherwise(substring(c, s + 1, len))
        }
      })
    case "regexextract" =>
      val pattern = require(pStr(ctx, "pattern"), "regexExtract.pattern")
      // Go semantics (transform.go:194-219): no-match / non-string /
      // group-less pattern -> null; a MATCH whose group captured "" -> "".
      // rlike distinguishes no-match from empty-capture (both "" from
      // regexp_extract), keeping everything codegen'd.
      val groups = java.util.regex.Pattern.compile(pattern).matcher("").groupCount()
      Out(ctx.sourceType match {
        case _: StringType if groups >= 1 =>
          when(ctx.source.rlike(pattern), regexp_extract(ctx.source, pattern, 1))
        case _ => lit(null).cast(StringType)
      })

    case "epochtodate" =>
      val parsed = epochSeconds(ctx)
      // unparseable → passthrough (stringified — SURVEY §2.3 #16 note)
      Out(coalesce(date_format(to_utc_ts(parsed), "yyyy-MM-dd"),
        goToString(ctx.source, ctx.sourceType)))
    case "calculateage" =>
      // epoch seconds → age in whole days, floor, future → 0 (transform.go:169-191)
      val parsed = epochSeconds(ctx)
      val nowDate = ctx.engine.nowEpoch
        .map(e => to_date(from_unixtime(lit(e))))
        .getOrElse(current_date())
      Out(when(parsed.isNotNull,
        greatest(lit(0), datediff(nowDate, to_date(to_utc_ts(parsed))))))
    case "dateconvert" =>
      val ts = parseDate(ctx)
      val outFmt = GoTime.toJavaPattern(pStr(ctx, "outputFormat").getOrElse("2006-01-02T15:04:05Z07:00"))
      // failure → passthrough (transform.go:357-360)
      Out(coalesce(date_format(ts, outFmt), goToString(ctx.source, ctx.sourceType)))
    case "multidateconvert" =>
      val formats = require(pList(ctx, "formats"), "multiDateConvert.formats").map(_.toString)
      val outFmt = GoTime.toJavaPattern(require(pStr(ctx, "outputFormat"), "multiDateConvert.outputFormat"))
      val s = ctx.source.cast(StringType)
      val ts = coalesce(formats.map(f => tryToTimestamp(s, GoTime.toJavaPattern(f))): _*)
      Out(coalesce(date_format(ts, outFmt), goToString(ctx.source, ctx.sourceType)))

    case "branch" =>
      // ordered branches; condition is govaluate over record fields +
      // `inputValue`; first true wins (transform.go:246-308)
      val branches: Seq[(Option[String], Any)] =
        require(pList(ctx, "branches"), "branch.branches").map {
          case m: java.util.Map[_, _] =>
            val sm = scala.jdk.CollectionConverters.MapHasAsScala(m).asScala
              .map { case (k, v) => (k.toString, v.asInstanceOf[Any]) }.toMap
            (sm.get("condition").map(_.toString), sm.getOrElse("value", null))
          case m: Map[_, _] =>
            val sm = m.asInstanceOf[Map[String, Any]]
            (sm.get("condition").map(_.toString), sm.getOrElse("value", null))
          case x => throw new IllegalArgumentException(s"branch: bad branch entry $x")
        }
      val isStringField: String => Boolean = f =>
        if (f == ctx.sourceName) ctx.sourceType.isInstanceOf[StringType]
        else ctx.field(f).exists(_._2.isInstanceOf[StringType])
      def tsFlavor(t: DataType): Option[String] = t match {
        case TimestampNTZType => Some("timestamp_ntz")
        case _: TimestampType => Some("timestamp")
        case _: DateType      => Some("date")
        case _                => None
      }
      val isTsField: String => Option[String] = f =>
        if (f == ctx.sourceName) tsFlavor(ctx.sourceType)
        else ctx.field(f).flatMap(p => tsFlavor(p._2))
      val result = branches.foldLeft[Option[Column]](None) { case (acc, (condOpt, value)) =>
        val cond = Goval.translate(
          require(condOpt, "branch.condition"),
          stringTyped = isStringField,
          rename = n => if (n == "inputValue") ctx.sourceName else n,
          timestampTyped = isTsField).sql
        val v = litAny(value)
        Some(acc match {
          case None => when(expr(cond), v)
          case Some(w) => w.when(expr(cond), v)
        })
      }
      Out(result.map(_.otherwise(ctx.source)).getOrElse(ctx.source))

    case "coalesce" =>
      // first field from RECORD STATE that is non-nil and (for strings)
      // non-empty; ignores the source value (transform.go:534-570)
      val fields = require(pList(ctx, "fields"), "coalesce.fields").map(_.toString)
      val cols = fields.map { f =>
        ctx.field(f) match {
          case Some((c, StringType)) => when(c =!= "", c)
          case Some((c, _)) => c
          case None => lit(null)
        }
      }
      Out(coalesce(cols: _*))

    case "hash" =>
      val algo = require(pStr(ctx, "algorithm"), "hash.algorithm").toLowerCase
      if (ctx.engine.fipsMode && algo == "md5")
        throw new IllegalArgumentException("hash: md5 is not permitted in FIPS mode")
      val fields = require(pList(ctx, "fields"), "hash.fields").map(_.toString).sorted
      val parts = fields.map { f =>
        ctx.field(f) match {
          case Some((c, dt)) => GoValues.goCanonicalString(c, dt)
          case None => lit("<MISSING>") // transform.go:648-650
        }
      }
      val joined = concat_ws("||", parts: _*)
      Out(algo match {
        case "sha256" => sha2(joined.cast(BinaryType), 256)
        case "sha512" => sha2(joined.cast(BinaryType), 512)
        case "md5"    => md5(joined.cast(BinaryType))
        case other    => throw new IllegalArgumentException(s"hash: unsupported algorithm $other")
      })

    case "validaterequired" =>
      val failed = ctx.sourceType match {
        case _: StringType => ctx.source.isNull || trim(ctx.source) === ""
        case _ => ctx.source.isNull
      }
      Out(ctx.source, Some(when(failed,
        lit(s"validateRequired: field '${ctx.sourceName}' is required"))))
    case "validateregex" =>
      val pattern = require(pStr(ctx, "pattern"), "validateRegex.pattern")
      val failed = ctx.sourceType match {
        case _: StringType => ctx.source.isNotNull && !ctx.source.rlike(pattern)
        case _ => lit(false) // non-string passes (transform.go:826-829)
      }
      Out(ctx.source, Some(when(failed,
        lit(s"validateRegex: field '${ctx.sourceName}' does not match pattern"))))
    case "validatenumericrange" =>
      val minO = pDouble(ctx, "min"); val maxO = pDouble(ctx, "max")
      if (minO.isEmpty && maxO.isEmpty)
        throw new IllegalArgumentException("validateNumericRange: needs min and/or max")
      val num = GoValues.goToFloat(ctx.source, ctx.sourceType)
      // non-numeric passes (transform.go:858-861)
      val oob = Seq(minO.map(m => num < m), maxO.map(m => num > m))
        .flatten.reduce(_ || _)
      Out(ctx.source, Some(when(num.isNotNull && oob,
        lit(s"validateNumericRange: field '${ctx.sourceName}' out of range"))))
    case "validateallowedvalues" =>
      val values = require(pList(ctx, "values"), "validateAllowedValues.values")
      // CompareValues numeric cross-type equality (transform.go:895-921)
      val numericValues = values.flatMap {
        case n: Number => Some(n.doubleValue)
        case s: String => scala.util.Try(s.toDouble).toOption
        case _ => None
      }
      val asNum = GoValues.goToFloat(ctx.source, ctx.sourceType)
      val strMatch = ctx.source.cast(StringType).isin(values.map(_.toString): _*)
      val numMatch = if (numericValues.nonEmpty) asNum.isin(numericValues: _*) else lit(false)
      Out(ctx.source, Some(when(!(coalesce(strMatch, lit(false)) || coalesce(numMatch, lit(false))),
        lit(s"validateAllowedValues: field '${ctx.sourceName}' not in allowed values"))))

    case other =>
      throw new IllegalArgumentException(s"unknown transform: $other")
  }

  // ---- shared pieces ----

  /** Go toString (transform.go:466-475): nil→"", %v formatting. */
  def goToString(c: Column, dt: DataType): Column = {
    val s = dt match {
      case _: FloatType | _: DoubleType => GoFloatFormat.goFormat(c.cast(DoubleType))
      case _: BooleanType => when(c, lit("true")).otherwise(lit("false"))
      case _: TimestampType => GoValues.rfc3339Nano(c)
      case _ => c.cast(StringType)
    }
    coalesce(s, lit(""))
  }

  /** strings passthrough for non-string inputs (trim/upper/lower/…). */
  private def ifString(ctx: Ctx)(f: Column => Column): Column = ctx.sourceType match {
    case _: StringType => f(ctx.source)
    case _ => ctx.source
  }

  /** Parse epoch seconds per Go rules: ints pass, floats truncate toward
    * zero (Go int64(v)), numeric strings int-then-float (transform.go:143-166). */
  private def epochSeconds(ctx: Ctx): Column = ctx.sourceType match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => ctx.source.cast(LongType)
    case _: FloatType | _: DoubleType =>
      // trunc toward zero; safeLongCast so NaN / out-of-long-range values
      // (incl. exactly 2^63, which ANSI cast saturates) become null
      graft.functions.GoValues.safeLongCast(ctx.source.cast(DoubleType))
    case _: StringType =>
      val t = trim(ctx.source)
      coalesce(
        when(t.rlike("^[+-]?[0-9]+$"), t.try_cast(LongType)),
        graft.functions.GoValues.safeLongCast(t.try_cast(DoubleType)))
    case _ => lit(null).cast(LongType)
  }

  private def to_utc_ts(epochSecs: Column): Column =
    // session TZ is UTC everywhere in this engine; from_unixtime renders
    // in session TZ, so this is UTC calendar math as the reference does.
    to_timestamp(from_unixtime(epochSecs))

  /**
   * try_to_timestamp with a Go-layout pattern, working around Spark's
   * parse-side pattern limits: 'E' (day-of-week) is format-only, so
   * RFC1123/RFC822-style layouts strip the "Mon, " prefix from the
   * input instead; zone-NAME parsing ('zzz') is unreliable, and Go
   * itself binds a bare abbreviation to offset 0 unless it matches the
   * local zone — so a trailing zone name is stripped and the timestamp
   * read as UTC (Go-parity for non-local abbreviations).
   */
  private def tryToTimestampGo(s0: Column, javaPattern: String): Column = {
    var pat = javaPattern
    var s = s0
    if (pat.startsWith("EEE, ")) {
      pat = pat.substring(5)
      s = regexp_replace(s, "^[A-Za-z]{3}, ", "")
    } else if (pat.startsWith("EEE ")) {
      pat = pat.substring(4)
      s = regexp_replace(s, "^[A-Za-z]{3} ", "")
    }
    if (pat.endsWith(" zzz")) {
      pat = pat.substring(0, pat.length - 4)
      s = regexp_replace(s, " [A-Za-z]{2,5}$", "")
    }
    try_to_timestamp(s, lit(pat))
  }

  private def tryToTimestamp(s: Column, javaPattern: String): Column =
    tryToTimestampGo(s, javaPattern)

  /** dateConvert input parse: string via layout(s) or fallback list;
    * time.Time input passes straight through (transform.go:311-362). */
  private def parseDate(ctx: Ctx): Column = ctx.sourceType match {
    case _: TimestampType => ctx.source
    case _: DateType => ctx.source.cast(TimestampType)
    case _ =>
      val s = ctx.source.cast(StringType)
      pStr(ctx, "inputFormat") match {
        case Some(f) => tryToTimestamp(s, GoTime.toJavaPattern(f))
        case None =>
          coalesce(GoTime.fallbackJavaPatterns.map(p => tryToTimestamp(s, p)): _*)
      }
  }

  private def litAny(v: Any): Column = v match {
    case null => lit(null)
    case n: java.lang.Integer => lit(n.intValue)
    case n: java.lang.Long => lit(n.longValue)
    case n: java.lang.Double => lit(n.doubleValue)
    case n: java.lang.Float => lit(n.floatValue)
    case b: java.lang.Boolean => lit(b.booleanValue)
    case s: String => lit(s)
    case other => lit(other.toString)
  }
}
