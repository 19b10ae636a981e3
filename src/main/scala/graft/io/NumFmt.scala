package graft.io

/**
 * Minimal XLSX number-format engine: renders a numeric cell value the
 * way a spreadsheet displays it, so the reader returns FORMATTED
 * display strings like the reference does via excelize GetCellValue
 * (/root/reference/internal/io/xlsx.go:150-156).
 *
 * Covers the ECMA-376 §18.8.30 builtin ids (dates, times, percents,
 * thousands, scientific, negative-paren sections) plus the common
 * custom-code tokens (yyyy/mm/dd/hh/ss, 0/#/,/%/@, ";"-sections,
 * "[Red]"-style modifiers). Unknown codes fall back to the Go-style
 * shortest rendering (the pre-round-4 behavior).
 */
object NumFmt {

  /** ECMA-376 part 1 §18.8.30 implied builtin format codes. */
  val builtin: Map[Int, String] = Map(
    1 -> "0", 2 -> "0.00", 3 -> "#,##0", 4 -> "#,##0.00",
    9 -> "0%", 10 -> "0.00%", 11 -> "0.00E+00",
    14 -> "mm-dd-yy", 15 -> "d-mmm-yy", 16 -> "d-mmm", 17 -> "mmm-yy",
    18 -> "h:mm AM/PM", 19 -> "h:mm:ss AM/PM", 20 -> "h:mm",
    21 -> "h:mm:ss", 22 -> "m/d/yy h:mm",
    37 -> "#,##0 ;(#,##0)", 38 -> "#,##0 ;[Red](#,##0)",
    39 -> "#,##0.00;(#,##0.00)", 40 -> "#,##0.00;[Red](#,##0.00)",
    45 -> "mm:ss", 46 -> "[h]:mm:ss", 47 -> "mmss.0",
    48 -> "##0.0E+0", 49 -> "@")

  private val monthsShort = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val monthsLong = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November", "December")

  /** Format `v` per `code`; General/unknown -> Go shortest rendering. */
  def format(v: Double, code: String): String = {
    if (code == null || code.isEmpty || code.equalsIgnoreCase("general"))
      return graft.functions.GoFloatFormat.format(v)
    // ';'-separated sections: positive[;negative[;zero]]
    val sections = splitSections(code)
    val section =
      if (v < 0 && sections.length >= 2) sections(1)
      else if (v == 0 && sections.length >= 3) sections(2)
      else sections(0)
    val clean = stripModifiers(section)
    if (clean.trim == "@") graft.functions.GoFloatFormat.format(v)
    else if (isDateCode(clean)) formatDate(v, clean)
    else {
      val useAbs = v < 0 && sections.length >= 2 // sign carried by the section text
      formatNumeric(if (useAbs) -v else v, clean)
    }
  }

  private def splitSections(code: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inQ = false
    code.foreach {
      case '"' => inQ = !inQ; sb.append('"')
      case ';' if !inQ => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    out += sb.toString
    out.toArray
  }

  /** Drop color/condition brackets ("[Red]", "[>=100]") but KEEP
    * elapsed-time brackets ("[h]", "[mm]", "[ss]"). */
  private def stripModifiers(s: String): String =
    "\\[([^\\]]*)\\]".r.replaceAllIn(s, m => {
      val inner = m.group(1)
      if (inner.nonEmpty && inner.forall(c => "hms".contains(c.toLower))) m.matched else ""
    })

  /** A code is a date/time format when it carries y/m/d/h/s tokens
    * outside quoted literals (the standard heuristic). */
  private[io] def isDateCode(code: String): Boolean = {
    var inQ = false
    var i = 0
    while (i < code.length) {
      val c = code.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == '\\') i += 1
      else if (!inQ && "ymdhsYMDHS".indexOf(c) >= 0) return true
      else if (!inQ && (c == '0' || c == '#' || c == '?')) return false
      i += 1
    }
    false
  }

  // ---- date/time ----

  /** Excel serial day -> calendar fields. Day 1 = 1900-01-01; Excel
    * inherits Lotus' phantom 1900-02-29 (serial 60), so serials >= 61
    * are offset by one — epoch 1899-12-30 handles both for modern dates. */
  private def formatDate(serial: Double, code: String): String = {
    val days = math.floor(serial).toLong
    val dayFrac = serial - days
    val secondsTotal = math.round(dayFrac * 86400.0)
    // serials < 60 predate the phantom day: day 1 = 1900-01-01
    val date =
      if (days < 60) java.time.LocalDate.of(1899, 12, 31).plusDays(days)
      else java.time.LocalDate.of(1899, 12, 30).plusDays(days)
    val dt = java.time.LocalDateTime.of(date, java.time.LocalTime.MIDNIGHT)
      .plusSeconds(secondsTotal)
    val is12h = code.toUpperCase.contains("AM/PM")
    val sb = new StringBuilder
    var i = 0
    val up = code
    def peekRun(c: Char): Int = { var j = i; while (j < up.length && up.charAt(j).toLower == c) j += 1; j - i }
    var lastWasHour = false
    while (i < up.length) {
      val c = up.charAt(i)
      val lc = c.toLower
      if (c == '"') { // quoted literal
        val end = up.indexOf('"', i + 1)
        val stop = if (end == -1) up.length else end
        sb.append(up.substring(i + 1, stop)); i = stop + 1
      } else if (c == '\\' && i + 1 < up.length) { sb.append(up.charAt(i + 1)); i += 2 }
      else if (c == '[') { // elapsed token [h]/[mm]/[ss]
        val end = up.indexOf(']', i)
        val inner = up.substring(i + 1, end).toLowerCase
        val totalH = days * 24 + secondsTotal / 3600
        if (inner.startsWith("h")) sb.append(totalH)
        else if (inner.startsWith("m")) sb.append(days * 1440 + secondsTotal / 60)
        else sb.append(days * 86400 + secondsTotal)
        i = end + 1
        lastWasHour = inner.startsWith("h")
      } else if (up.regionMatches(true, i, "AM/PM", 0, 5)) {
        sb.append(if (dt.getHour < 12) "AM" else "PM"); i += 5
      } else if (lc == 'y') {
        val n = peekRun('y')
        sb.append(if (n <= 2) f"${dt.getYear % 100}%02d" else dt.getYear.toString)
        i += n; lastWasHour = false
      } else if (lc == 'm') {
        val n = peekRun('m')
        // minutes when right after an hour token or right before seconds
        val restIsSeconds = {
          var j = i + n
          while (j < up.length && !up.charAt(j).isLetter && up.charAt(j) != '"') j += 1
          j < up.length && up.charAt(j).toLower == 's'
        }
        if (lastWasHour || restIsSeconds) {
          sb.append(if (n >= 2) f"${dt.getMinute}%02d" else dt.getMinute.toString)
        } else n match {
          case 1 => sb.append(dt.getMonthValue.toString)
          case 2 => sb.append(f"${dt.getMonthValue}%02d")
          case 3 => sb.append(monthsShort(dt.getMonthValue - 1))
          case _ => sb.append(monthsLong(dt.getMonthValue - 1))
        }
        i += n; lastWasHour = false
      } else if (lc == 'd') {
        val n = peekRun('d')
        sb.append(if (n >= 2) f"${dt.getDayOfMonth}%02d" else dt.getDayOfMonth.toString)
        i += n; lastWasHour = false
      } else if (lc == 'h') {
        val n = peekRun('h')
        val h = if (is12h) { val x = dt.getHour % 12; if (x == 0) 12 else x } else dt.getHour
        sb.append(if (n >= 2) f"$h%02d" else h.toString)
        i += n; lastWasHour = true
      } else if (lc == 's') {
        val n = peekRun('s')
        sb.append(if (n >= 2) f"${dt.getSecond}%02d" else dt.getSecond.toString)
        i += n; lastWasHour = false
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- numeric ----

  /** Render per a numeric pattern: decimals from the 0/#-run after '.',
    * thousands separators when the integer part carries ',', percent
    * scaling, scientific 0.00E+00. Literal text outside the digit mask
    * (e.g. the parens of "(#,##0.00)") is emitted verbatim. */
  private def formatNumeric(v0: Double, code: String): String = {
    val isPct = code.contains('%')
    val sci = "[0#]+\\.?[0#]*[Ee][+-][0#]+".r.findFirstIn(code)
    val v = if (isPct) v0 * 100 else v0
    if (sci.isDefined) {
      val decimals = sci.get.takeWhile(c => c != 'E' && c != 'e')
        .dropWhile(_ != '.').count(c => c == '0' || c == '#')
      // Excel always signs the exponent; Java only signs negatives
      return String.format(java.util.Locale.ROOT, s"%.${decimals}E", Double.box(v))
        .replaceAll("E(?=\\d)", "E+")
    }
    // digit mask = the longest run of [0#,.] in the section
    val mask = "[0#][0#,.]*".r.findAllIn(code).maxByOption(_.length).getOrElse("0")
    val maskStart = code.indexOf(mask)
    val prefix = code.substring(0, maskStart).replace("\"", "")
    val suffix = code.substring(maskStart + mask.length).replace("\"", "")
    // '0' fraction slots are mandatory, '#' slots drop trailing zeros:
    // "0.0#" gives 1.5 -> "1.5" (min 1 digit) but 1.0 -> "1.0".
    val fracMask = if (mask.contains('.')) mask.dropWhile(_ != '.').drop(1) else ""
    val decimals = fracMask.count(c => c == '0' || c == '#')
    val minFrac = fracMask.lastIndexOf('0') + 1 // 0 when no mandatory slot
    val grouped = mask.contains(',')
    val bd = BigDecimal(v).setScale(decimals, BigDecimal.RoundingMode.HALF_UP)
    var body =
      if (grouped) String.format(java.util.Locale.ROOT, s"%,.${decimals}f", Double.box(bd.toDouble))
      else bd.bigDecimal.toPlainString
    if (decimals > minFrac && body.contains('.')) {
      val dot = body.indexOf('.')
      var end = body.length
      while (end - dot - 1 > minFrac && body.charAt(end - 1) == '0') end -= 1
      if (end - 1 == dot) end = dot // nothing mandatory left -> drop the '.'
      body = body.substring(0, end)
    }
    prefix + body + suffix
  }
}
