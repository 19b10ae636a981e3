package graft.config

/**
 * Decode-time error accumulation for [[PlaybookLoader]]. The
 * reference's loader (go-yaml `Unmarshal`,
 * /root/reference/internal/config/load.go:12-122) REJECTS a value of
 * the wrong YAML type for a field instead of silently substituting the
 * zero value; its validator then accumulates every semantic error into
 * one report (validation.go:52-688). This mirror gives the Scala
 * loader the same UX — every mistyped value, non-list list, non-map
 * section, and unknown key becomes a line in the single
 * "invalid playbook:" error, never a silent default and never a bare
 * ClassCastException — and goes one step further than go-yaml by also
 * naming keys the schema doesn't know (a typo like `stratgy:` is a
 * silently-ignored key in the reference; here it's an error).
 */
private[config] final class DecodeErrors {
  val errs = scala.collection.mutable.ArrayBuffer.empty[String]
  def add(msg: String): Unit = errs += msg
}

private[config] object Decode {
  import scala.jdk.CollectionConverters._

  def render(v: Any): String = v match {
    case null => "null"
    case s: String => s"'$s'"
    case _: java.util.List[_] => "a list"
    case _: java.util.Map[_, _] => "a mapping"
    case other => s"'$other'"
  }

  def toScalaMap(j: java.util.Map[_, _]): Map[String, Any] =
    j.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap

  /** Unknown keys are errors, not silence: a typo'd key is the config
    * mistake users actually make, and ignoring it means a whole section
    * silently doesn't apply. */
  def known(m: Map[String, Any], knownKeys: Set[String], where: String)
           (implicit d: DecodeErrors): Unit =
    (m.keySet -- knownKeys).toSeq.sorted.foreach(k =>
      d.add(s"$where: unknown key '$k'"))

  def section(m: Map[String, Any], k: String, where: String)
             (implicit d: DecodeErrors): Option[Map[String, Any]] =
    m.get(k) match {
      case None => None
      case Some(j: java.util.Map[_, _]) => Some(toScalaMap(j))
      case Some(v) => d.add(s"$where: $k must be a mapping (got ${render(v)})"); None
    }

  def listOfMaps(m: Map[String, Any], k: String, where: String)
                (implicit d: DecodeErrors): Seq[Map[String, Any]] =
    m.get(k) match {
      case None => Seq.empty
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.zipWithIndex.flatMap {
          case (j: java.util.Map[_, _], _) => Some(toScalaMap(j))
          case (x, i) =>
            d.add(s"$where[$i]: must be a mapping (got ${render(x)})"); None
        }
      case Some(v) =>
        d.add(s"$where: $k must be a list of mappings (got ${render(v)})"); Seq.empty
    }

  def str(m: Map[String, Any], k: String, where: String)
         (implicit d: DecodeErrors): Option[String] =
    m.get(k) match {
      case None => None
      case Some(s: String) => Some(s).filter(_.nonEmpty) // "" == absent
      case Some(v) => d.add(s"$where: $k must be a string (got ${render(v)})"); None
    }

  def int(m: Map[String, Any], k: String, where: String)
         (implicit d: DecodeErrors): Option[Int] =
    m.get(k) match {
      case None => None
      case Some(n: Number) if n.doubleValue == n.intValue.toDouble => Some(n.intValue)
      case Some(n: Number) =>
        d.add(s"$where: $k must be an integer (got ${render(n)})"); None
      case Some(s: String) =>
        try Some(s.trim.toInt)
        catch { case _: NumberFormatException =>
          d.add(s"$where: $k must be an integer (got '$s')"); None }
      case Some(v) => d.add(s"$where: $k must be an integer (got ${render(v)})"); None
    }

  def long(m: Map[String, Any], k: String, where: String)
          (implicit d: DecodeErrors): Option[Long] =
    m.get(k) match {
      case None => None
      case Some(n: Number) if n.doubleValue == n.longValue.toDouble => Some(n.longValue)
      case Some(n: Number) =>
        d.add(s"$where: $k must be an integer (got ${render(n)})"); None
      case Some(s: String) =>
        try Some(s.trim.toLong)
        catch { case _: NumberFormatException =>
          d.add(s"$where: $k must be an integer (got '$s')"); None }
      case Some(v) => d.add(s"$where: $k must be an integer (got ${render(v)})"); None
    }

  def dbl(m: Map[String, Any], k: String, where: String)
         (implicit d: DecodeErrors): Option[Double] =
    m.get(k) match {
      case None => None
      case Some(n: Number) => Some(n.doubleValue)
      case Some(s: String) =>
        try Some(s.trim.toDouble)
        catch { case _: NumberFormatException =>
          d.add(s"$where: $k must be a number (got '$s')"); None }
      case Some(v) => d.add(s"$where: $k must be a number (got ${render(v)})"); None
    }

  def bool(m: Map[String, Any], k: String, where: String, dflt: Boolean)
          (implicit d: DecodeErrors): Boolean =
    m.get(k) match {
      case None => dflt
      case Some(b: java.lang.Boolean) => b.booleanValue
      case Some(s: String) if s.equalsIgnoreCase("true") => true
      case Some(s: String) if s.equalsIgnoreCase("false") => false
      case Some(v) =>
        d.add(s"$where: $k must be a boolean (got ${render(v)})"); dflt
    }

  def strList(m: Map[String, Any], k: String, where: String)
             (implicit d: DecodeErrors): Seq[String] =
    m.get(k) match {
      case None => Seq.empty
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(String.valueOf(_))
      case Some(v) =>
        d.add(s"$where: $k must be a list of strings (got ${render(v)})"); Seq.empty
    }
}
