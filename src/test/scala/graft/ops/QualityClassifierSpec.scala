package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // target speaks "alpha beta gamma"; the raw training pool is junk
  private val target = (1L to 12L).map(i =>
    (100L + i, s"alpha beta gamma alpha delta w$i")).toDF("doc_id", "text")
  private val rawTrain = (1L to 12L).map(i =>
    (200L + i, s"zebra quux corge grault zebra j$i")).toDF("doc_id", "text")
  // held-out docs to score (not in either training pool)
  private val eval = Seq(
    (1L, "alpha beta gamma alpha delta"),   // target-like
    (2L, "zebra quux corge grault zebra"),  // junk
    (3L, "zebra quux alpha corge grault")   // mostly junk
  ).toDF("doc_id", "text")

  test("held-out target-like docs get higher p_target than junk") {
    val scored = QualityClassifier.trainScore(rawTrain, target, "doc_id", "text",
        scoreOn = Some(eval))
      .select(col("id"), col("p_target")).as[(Long, Double)].collect().toMap
    assert(scored.keySet == Set(1L, 2L, 3L))
    assert(scored(1L) > 0.5, s"target-like doc should score > 0.5: ${scored(1L)}")
    assert(scored(2L) < 0.5, s"junk doc should score < 0.5: ${scored(2L)}")
    assert(scored(1L) > scored(3L) && scored(3L) > scored(2L),
      s"expected monotone target-likeness, got $scored")
    scored.values.foreach(p => assert(p > 0.0 && p < 1.0))
  }

  test("default scoreOn scores the raw corpus itself") {
    val scored = QualityClassifier.trainScore(rawTrain, target, "doc_id", "text")
    assert(scored.count() == 12)
    assert(scored.agg(max(col("p_target"))).head().getDouble(0) < 0.5)
  }

  test("scoring plan is relational: broadcast coefficients, no UDF at corpus volume") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val exec = QualityClassifier.trainScore(rawTrain, target, "doc_id", "text",
        scoreOn = Some(eval))
      .queryExecution.executedPlan
    val s = exec.toString
    assert(s.contains("BroadcastHashJoin"), s"coefficients should broadcast:\n$s")
    assert(!s.contains("BatchEvalPython") && !s.toLowerCase.contains("scalaudf"),
      s"no UDF may appear in the scoring plan:\n$s")
    exec.collect { case smj: SortMergeJoinExec => smj }.foreach { smj =>
      assert(smj.collect { case g: GenerateExec => g }.isEmpty,
        s"gram stream must not feed a shuffle join:\n$smj")
    }
  }
}
