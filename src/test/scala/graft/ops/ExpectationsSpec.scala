package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Expectations.check]]: exact violation counts per rule type on a
  * fixture with known defects, single-aggregate folding for row-local
  * rules, and the null semantics each rule declares. */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(5.0), "A", "ok_1", 10L),
    (Some(2L), Some(50.0), "X", "bad!", 20L),   // range + accepted + regex
    (None, None, "N", "ok_2", 10L),             // null id; null value passes range
    (Some(1L), Some(-1.0), "R", "ok_3", 99L)    // dup id; range; orphan ref
  ).toDF("id", "v", "flag", "name", "ref_k")

  private val refTable = Seq(10L, 20L).toDF("k")

  test("every rule type counts exactly") {
    import Expectations._
    val rep = check(df, Seq(
      NotNull("id"),
      InRange("v", 0.0, 30.0),
      AcceptedValues("flag", Seq("A", "N", "R")),
      MatchesRegex("name", "^ok_[0-9]$"),
      Satisfies("v >= 0", "v_nonneg"),
      Unique(Seq("id")),
      RefIntegrity("ref_k", refTable, "k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rep("not_null(id)") == ((4L, 1L, false)))
    assert(rep("in_range(v,0.0,30.0)") == ((4L, 2L, false)), "null v is not a range violation")
    assert(rep("accepted_values(flag)") == ((4L, 1L, false)))
    assert(rep("matches_regex(name)") == ((4L, 1L, false)))
    // v >= 0: row2 false, row3 null (violation per Satisfies contract)
    assert(rep("satisfies(v_nonneg)") == ((4L, 2L, false)))
    // ids (1, 1): both rows of the duplicated group count
    assert(rep("unique(id)") == ((4L, 2L, false)))
    assert(rep("ref_integrity(ref_k)") == ((4L, 1L, false)))
  }

  test("empty table: every rule reports 0 violations and pass=true, never null") {
    import Expectations._
    val empty = df.filter(lit(false))
    val rep = check(empty, Seq(NotNull("id"), InRange("v", 0, 1),
      Unique(Seq("id")), RefIntegrity("ref_k", refTable, "k")))
      .collect()
    assert(rep.length == 4)
    rep.foreach { r =>
      assert(!r.isNullAt(2) && r.getLong(2) == 0L, s"null/nonzero violations: $r")
      assert(!r.isNullAt(3) && r.getBoolean(3), s"null/false pass: $r")
    }
  }

  test("duplicate rules dedupe instead of AMBIGUOUS_REFERENCE; cast-garbage violates in_range; regex is full-match") {
    import Expectations._
    val d = Seq(("1", "junk1234junk"), ("N/A", "1234")).toDF("amount", "code")
    val rep = check(d, Seq(
      InRange("amount", 0.0, 100.0),
      InRange("amount", 0.0, 100.0), // duplicate declaration
      MatchesRegex("code", "[0-9]{4}")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep.size == 2, "duplicate rule deduped")
    assert(rep("in_range(amount,0.0,100.0)") == 1L, "'N/A' fails the cast AND the gate")
    assert(rep("matches_regex(code)") == 1L, "substring hit is not a full match")
  }

  test("clean table passes every rule; empty-group aggregates yield 0 not null") {
    import Expectations._
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val rep = check(clean, Seq(NotNull("id"), Unique(Seq("id")),
      RefIntegrity("id", Seq(1L, 2L, 3L).toDF("k"), "k")))
    assert(rep.collect().forall(_.getBoolean(3)))
    assert(rep.filter(col("n_violations") =!= 0L).count() == 0)
  }
}
