package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val target = Seq(
    (101L, "alpha beta gamma alpha beta"),
    (102L, "alpha beta delta gamma beta"),
    (103L, "beta gamma alpha delta alpha")
  ).toDF("doc_id", "text")

  private val raw = Seq(
    (1L, "alpha beta gamma delta beta"),   // target-like
    (2L, "zebra quux corge grault zebra"), // nothing in common
    (3L, "alpha beta zebra quux gamma")    // mixed
  ).toDF("doc_id", "text")

  test("target-like docs score higher; ordering is hash-scheme invariant") {
    for (portable <- Seq(false, true)) {
      val w = Dsir.importanceWeights(raw, target, "doc_id", "text",
          portableHashing = portable)
        .select(col("id"), col("logw")).as[(Long, Double)].collect().toMap
      assert(w.keySet == Set(1L, 2L, 3L))
      assert(w(1L) > w(3L) && w(3L) > w(2L),
        s"expected target-like > mixed > unrelated, got $w (portable=$portable)")
    }
  }

  test("logw_micro is an exact integer sum over per-gram bucket ratios") {
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text")
    val r = out.filter(col("id") === 1L).head()
    // 5 unigrams + 4 bigrams
    assert(r.getAs[Long]("n_grams") == 9L)
    assert(r.getAs[Double]("logw")
      == r.getAs[Long]("logw_micro").toDouble / 1e6)
  }

  test("plan: the gram stream joins the log-ratio table via broadcast only") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val exec = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .queryExecution.executedPlan
    assert(exec.toString.contains("BroadcastHashJoin"),
      s"lr table should broadcast onto the gram stream:\n$exec")
    // A shuffle join is only acceptable between the two BOUNDED (<= B
    // rows) bucket-count aggregates — never on the corpus-volume gram
    // stream (the Generate/explode side).
    exec.collect { case smj: SortMergeJoinExec => smj }.foreach { smj =>
      assert(smj.collect { case g: GenerateExec => g }.isEmpty,
        s"corpus-volume gram stream must not feed a shuffle join:\n$smj")
    }
  }

  test("null and empty texts: nulls drop, empty text still yields its unigram") {
    val rawN = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val out = Dsir.importanceWeights(rawN, target, "doc_id", "text")
    val ids = out.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // null text dropped; "" tokenizes to one empty gram
  }
}
