package graft.expr

/**
 * Go reference-time layout ("2006-01-02 15:04:05") → Java
 * DateTimeFormatter pattern translator.
 *
 * The reference's date transforms take Go layouts from playbook config
 * (/root/reference/internal/transform/transform.go:311-405) and fall
 * back to a fixed list when no inputFormat is given (:339-343). Spark's
 * to_timestamp/date_format take Java patterns, so config-time
 * translation keeps everything codegen'd (no date UDFs).
 */
object GoTime {

  // Longest-match-first token table.
  private val tokens: Seq[(String, String)] = Seq(
    "2006"    -> "yyyy",
    "January" -> "MMMM",
    "Jan"     -> "MMM",
    "Monday"  -> "EEEE",
    "Mon"     -> "EEE",
    "15"      -> "HH",
    "01"      -> "MM",
    "02"      -> "dd",
    "03"      -> "hh",
    "04"      -> "mm",
    "05"      -> "ss",
    "06"      -> "yy",
    "002"     -> "DDD",
    "1"       -> "M",
    "2"       -> "d",
    "3"       -> "h",
    "4"       -> "m",
    "5"       -> "s",
    "PM"      -> "a",
    "pm"      -> "a",
    ".000000000" -> ".SSSSSSSSS",
    ".000000"  -> ".SSSSSS",
    ".000"     -> ".SSS",
    "Z07:00"  -> "XXX",
    "Z0700"   -> "XX",
    "Z07"     -> "X",
    "-07:00"  -> "xxx",
    "-0700"   -> "xx",
    "-07"     -> "x",
    "MST"     -> "zzz",
  )

  /** Translate a Go layout string into a Java DateTimeFormatter pattern. */
  def toJavaPattern(goLayout: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = goLayout.length
    while (i < n) {
      tokens.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) =>
          sb.append(java); i += go.length
        case None =>
          val c = goLayout.charAt(i)
          // quote letters so Java doesn't interpret them as pattern chars
          if (c.isLetter) sb.append('\'').append(c).append('\'')
          else if (c == '\'') sb.append("''")
          else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }

  /**
   * The reference's no-inputFormat fallback list, in trial order
   * (transform.go:333-343): RFC3339 first, then 11 fixed layouts.
   */
  val fallbackGoLayouts: Seq[String] = Seq(
    "2006-01-02T15:04:05Z07:00", // RFC3339
    "2006-01-02",
    "2006/01/02",
    "01/02/2006",
    "2006-01-02T15:04:05Z0700",
    "2006-01-02 15:04:05",
    "Mon, 02 Jan 2006 15:04:05 -0700", // RFC1123Z
    "Mon, 02 Jan 2006 15:04:05 MST",   // RFC1123
    "02 Jan 06 15:04 -0700",           // RFC822Z
    "02 Jan 06 15:04 MST",             // RFC822
    "01-02-06",
    "20060102",
  )

  val fallbackJavaPatterns: Seq[String] = fallbackGoLayouts.map(toJavaPattern)
}
