package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.yaml.snakeyaml.Yaml

/**
 * Property-fuzz of the playbook loader over the mutation space a real
 * config author explores by accident: key deletion, type swaps, key
 * typos, enum typos. The contract under test (the reference's loader
 * UX — go-yaml strict field typing + the accumulated validator,
 * /root/reference/internal/config/load.go:12-122 +
 * validation.go:52-688):
 *
 *  1. EVERY mutated playbook either loads or throws exactly
 *     IllegalArgumentException — never a MatchError / NPE /
 *     ClassCastException out of the decode layer;
 *  2. a mistyped VALUE on a schema'd key is a load-time error that
 *     NAMES the key — never a silently-substituted default;
 *  3. a typo'd KEY is a load-time "unknown key" error — never a
 *     silently-ignored section;
 *  4. an enum typo is an error that echoes the bad value.
 *
 * Deterministic seeds throughout so failures reproduce.
 */
class PlaybookLoaderFuzzSpec extends AnyFunSuite {

  // ---- baseline playbook (must be valid) as a mutable java tree ----
  private def jmap(kvs: (String, Any)*): java.util.LinkedHashMap[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    kvs.foreach { case (k, v) => m.put(k, v) }
    m
  }
  private def jlist(vs: Any*): java.util.ArrayList[Any] = {
    val l = new java.util.ArrayList[Any]()
    vs.foreach(l.add)
    l
  }

  /** Fresh tree per mutation — mutations edit in place. Touches every
    * section, both layout families, and an analytics stage. */
  private def baseline: java.util.LinkedHashMap[String, Any] = jmap(
    "source" -> jmap("type" -> "parquet", "file" -> "/tmp/in.parquet"),
    "destination" -> jmap(
      "type" -> "parquet", "file" -> "/tmp/out",
      "partitionBy" -> jlist("k"), "compression" -> "snappy",
      "zorderBy" -> jlist("a", "b"), "zorderBits" -> 8, "zorderFiles" -> 4,
      "bloomIndexBy" -> jlist("a"), "bloomItemsPerFile" -> 1000,
      "bloomFpp" -> 0.05),
    "filter" -> "a > 1",
    "mappings" -> jlist(
      jmap("source" -> "a", "target" -> "b", "transform" -> "toint"),
      jmap("source" -> "c", "target" -> "d")),
    "flattening" -> jmap(
      "sourceField" -> "items", "targetField" -> "item",
      "includeParent" -> true, "errorOnNonList" -> false,
      "conditionField" -> "kind", "conditionValue" -> "x"),
    "deduplication" -> jmap(
      "keys" -> jlist("b"), "strategy" -> "min", "strategyField" -> "d"),
    "errorHandling" -> jmap(
      "mode" -> "skip", "logErrors" -> true, "errorFile" -> "/tmp/errs.csv"),
    "analytics" -> jlist(jmap("op" -> "where", "condition" -> "b is not null")))

  private def dump(tree: Any): String = new Yaml().dump(tree)

  /** Load outcome under the contract: Right(playbook) or
    * Left(the one accepted exception class). Anything else fails. */
  private def load(yaml: String, what: String): Either[IllegalArgumentException, Playbook] =
    try Right(PlaybookLoader.fromString(yaml))
    catch {
      case e: IllegalArgumentException => Left(e)
      case e: Throwable =>
        fail(s"non-accumulated ${e.getClass.getName} for $what: ${e.getMessage}\n--- yaml ---\n$yaml")
    }

  // ---- tree navigation / mutation (null-safe: a storm mutation may
  // have removed an ancestor already — then the edit is a no-op) ----
  private def nav(root: Any, segs: Seq[String]): Option[Any] =
    segs.foldLeft(Option(root)) {
      case (Some(m: java.util.Map[_, _]), k) =>
        Option(m.asInstanceOf[java.util.Map[String, Any]].get(k))
      case (Some(l: java.util.List[_]), i)
          if i.forall(_.isDigit) && i.toInt < l.size => Option(l.get(i.toInt))
      case _ => None
    }
  private def getAt(root: Any, path: Seq[String]): Any = nav(root, path).orNull
  private def parentMap(root: Any, path: Seq[String]): Option[java.util.Map[String, Any]] =
    nav(root, path.dropRight(1)).collect {
      case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]]
    }
  private def deleteAt(root: Any, path: Seq[String]): Unit =
    parentMap(root, path).foreach(_.remove(path.last))
  private def setAt(root: Any, path: Seq[String], v: Any): Unit =
    parentMap(root, path).foreach(_.put(path.last, v))
  private def renameAt(root: Any, path: Seq[String], to: String): Unit =
    parentMap(root, path).foreach { m =>
      if (m.containsKey(path.last)) { val v = m.remove(path.last); m.put(to, v) }
    }

  /** A value of a clearly-incompatible YAML type for the current one. */
  private def incompatible(current: Any): Any = current match {
    case _: java.util.Map[_, _] => "xyz"
    case _: java.util.List[_] => "xyz"
    case _: String => jlist("zz")
    case _: java.lang.Boolean => "maybe"
    case _: java.lang.Double => "lots"
    case _: Number => "notanum"
    case _ => jmap("zz" -> "zz")
  }

  /** Every schema'd path in the baseline (map keys only — mutation
    * targets; list elements are covered through their parent key). */
  private val strictPaths: Seq[Seq[String]] = Seq(
    Seq("source"), Seq("destination"), Seq("filter"), Seq("mappings"),
    Seq("flattening"), Seq("deduplication"), Seq("errorHandling"), Seq("analytics"),
    Seq("source", "type"), Seq("source", "file"),
    Seq("destination", "type"), Seq("destination", "file"),
    Seq("destination", "partitionBy"), Seq("destination", "compression"),
    Seq("destination", "zorderBy"), Seq("destination", "zorderBits"),
    Seq("destination", "zorderFiles"), Seq("destination", "bloomIndexBy"),
    Seq("destination", "bloomItemsPerFile"), Seq("destination", "bloomFpp"),
    Seq("mappings", "0", "source"), Seq("mappings", "0", "target"),
    Seq("mappings", "0", "transform"),
    Seq("flattening", "sourceField"), Seq("flattening", "targetField"),
    Seq("flattening", "includeParent"), Seq("flattening", "errorOnNonList"),
    Seq("flattening", "conditionField"),
    Seq("deduplication", "keys"), Seq("deduplication", "strategy"),
    Seq("deduplication", "strategyField"),
    Seq("errorHandling", "mode"), Seq("errorHandling", "logErrors"),
    Seq("errorHandling", "errorFile"))

  test("baseline is valid (the fuzz needs a green starting point)") {
    val pb = PlaybookLoader.fromString(dump(baseline))
    assert(pb.destination.zorderBy == Seq("a", "b") && pb.dedup.exists(_.strategy == "min"))
  }

  test("type swap on every schema'd key: load-time error that NAMES the key") {
    strictPaths.foreach { path =>
      val tree = baseline
      setAt(tree, path, incompatible(getAt(tree, path)))
      load(dump(tree), s"type-swap at ${path.mkString(".")}") match {
        case Left(e) =>
          assert(e.getMessage.contains(path.last),
            s"swap at ${path.mkString(".")} errored without naming the key: ${e.getMessage}")
        case Right(_) =>
          fail(s"type swap at ${path.mkString(".")} silently accepted")
      }
    }
  }

  test("key typo on every schema'd key: 'unknown key' error, never silence") {
    strictPaths.filterNot(_.contains("0")) // list-element keys: rule params are free-form
      .foreach { path =>
        val tree = baseline
        val typo = path.last + "x"
        renameAt(tree, path, typo)
        load(dump(tree), s"key-typo at ${path.mkString(".")}") match {
          case Left(e) =>
            assert(e.getMessage.contains(s"unknown key '$typo'"),
              s"typo at ${path.mkString(".")} not reported as unknown key: ${e.getMessage}")
          case Right(_) =>
            fail(s"typo'd key ${path.mkString(".")}->$typo silently ignored")
        }
      }
  }

  test("deleting a required key is an error; deleting an optional one still loads clean") {
    val required: Seq[Seq[String]] = Seq(
      Seq("source"), Seq("destination"),
      Seq("source", "type"), Seq("source", "file"),
      Seq("destination", "type"), Seq("destination", "file"),
      Seq("deduplication", "keys"), Seq("deduplication", "strategyField"),
      Seq("flattening", "sourceField"), Seq("flattening", "targetField"),
      Seq("flattening", "conditionField"), // breaks the with-value pairing
      Seq("mappings", "0", "source"), Seq("mappings", "0", "target"))
    required.foreach { path =>
      val tree = baseline
      deleteAt(tree, path)
      assert(load(dump(tree), s"delete ${path.mkString(".")}").isLeft,
        s"required ${path.mkString(".")} deleted without error")
    }
    val optional: Seq[Seq[String]] = Seq(
      Seq("filter"), Seq("mappings"), Seq("flattening"), Seq("deduplication"),
      Seq("errorHandling"), Seq("analytics"), Seq("destination", "compression"),
      Seq("destination", "zorderBy"), Seq("destination", "bloomIndexBy"),
      Seq("mappings", "0", "transform"), Seq("errorHandling", "errorFile"))
    optional.foreach { path =>
      val tree = baseline
      deleteAt(tree, path)
      // zorderBy carries zorderBits/zorderFiles with it, bloomIndexBy its
      // params — deleting just the list leaves them valid (defaults apply)
      assert(load(dump(tree), s"delete ${path.mkString(".")}").isRight,
        s"optional ${path.mkString(".")} deletion rejected")
    }
  }

  test("enum typos echo the bad value in the accumulated error") {
    val enums: Seq[(Seq[String], String)] = Seq(
      (Seq("source", "type"), "parquetx"),
      (Seq("destination", "type"), "parquetx"),
      (Seq("deduplication", "strategy"), "minx"),
      (Seq("errorHandling", "mode"), "skipx"),
      (Seq("mappings", "0", "transform"), "tointx"),
      (Seq("analytics", "0", "op"), "wherex"))
    enums.foreach { case (path, bad) =>
      val tree = baseline
      setAt(tree, path, bad)
      load(dump(tree), s"enum-typo at ${path.mkString(".")}") match {
        case Left(e) => assert(e.getMessage.contains(bad),
          s"enum typo at ${path.mkString(".")} not echoed: ${e.getMessage}")
        case Right(_) => fail(s"enum typo at ${path.mkString(".")} accepted")
      }
    }
  }

  test("analytics stage params: a typo'd key is an 'unknown param' error, not a silent default") {
    def loadErr(analytics: String): String =
      intercept[IllegalArgumentException](PlaybookLoader.fromString(s"""
        |source: {type: parquet, file: /tmp/in.parquet}
        |destination: {type: parquet, file: /tmp/o}
        |analytics:
        |$analytics
        |""".stripMargin)).getMessage
    // a misspelled OPTIONAL param would silently fall back to its
    // default — the invisible config mistake this check exists for
    val e1 = loadErr("""  - {op: near_dup_dedup, idCol: a, textCol: b, treshold: 0.9}""")
    assert(e1.contains("unknown param 'treshold'"), e1)
    // a misspelled REQUIRED param reports both faces
    val e2 = loadErr("""  - {op: where, conditionx: "a > 1"}""")
    assert(e2.contains("missing condition") && e2.contains("unknown param 'conditionx'"), e2)
    // expect rules get the same treatment per rule map
    val e3 = loadErr(
      """  - op: expect
        |    rules:
        |      - {type: in_range, col: a, lo: 0, hi: 9, hii: 10}""".stripMargin)
    assert(e3.contains("unknown key 'hii'"), e3)
  }

  test("randomized multi-mutation storm: only IllegalArgumentException ever escapes") {
    val params = Gen.Parameters.default
    val pathGen = Gen.oneOf(strictPaths)
    val kindGen = Gen.choose(0, 2)
    (0 until 200).foreach { i =>
      val tree = baseline
      val n = 1 + i % 3
      (0 until n).foreach { j =>
        val seed = Seed(1000L * i + j)
        val path = pathGen(params, seed).get
        kindGen(params, seed.next).get match {
          case 0 => deleteAt(tree, path)
          case 1 =>
            val cur = getAt(tree, path)
            if (cur != null) setAt(tree, path, incompatible(cur))
          case _ => if (getAt(tree, path) != null) renameAt(tree, path, path.last + "x")
        }
      }
      load(dump(tree), s"storm iteration $i") // contract: IAE or Playbook
    }
  }
}
