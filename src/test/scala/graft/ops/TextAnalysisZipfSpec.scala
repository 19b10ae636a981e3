package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisZipfSpec extends SparkTestBase {
  import spark.implicits._

  test("zipfFit: closed-form alpha from known frequencies; f < fmin excluded") {
    // source A tokens: x appears 4 times, y 2 times, z once (excluded)
    val docs = Seq(
      ("A", "x x y"), ("A", "x x y z"),
      ("B", "w w w w")
    ).toDF("source", "text")
    val out = TextAnalysis.zipfFit(docs, "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("sum_ln_micro"),
         r.getAs[java.lang.Double]("alpha"))).toMap
    // A: x f=4 -> ln(4/1.5), y f=2 -> ln(2/1.5); n=2
    val lnx = math.floor(math.log(4 / 1.5) * 1e6 + 0.5).toLong
    val lny = math.floor(math.log(2 / 1.5) * 1e6 + 0.5).toLong
    assert(out("A")._1 == 2L && out("A")._2 == lnx + lny)
    assert(math.abs(out("A")._3 - (1.0 + 2.0 / ((lnx + lny) / 1e6))) < 1e-12)
    // B: single type f=4
    assert(out("B")._1 == 1L && out("B")._2 == lnx)
    // natural-ish corpus sanity: more skewed -> smaller denominator per type
    assert(out("A")._3 > 1.0 && out("B")._3 > 1.0)
  }

  test("zipfFit: degenerate group (all f == fmin would still have ln > 0); empty group absent") {
    val docs = Seq(("C", "a a b b")).toDF("source", "text")
    val out = TextAnalysis.zipfFit(docs, "text", "source").collect()
    assert(out.length == 1 && out.head.getAs[java.lang.Double]("alpha") != null)
    val none = TextAnalysis.zipfFit(
      Seq(("D", "all unique tokens here")).toDF("source", "text"), "text", "source")
    assert(none.count() == 0) // every token f=1 < fmin -> group drops
  }

  test("perplexityPartition: per-source bands, ntile sizes, order-respecting, short docs absent") {
    // source A: 6 scoreable docs (2/2/2 under ntile(3)); source B: 3
    // (1/1/1); one single-token doc has no bigram and must be absent
    val docs = Seq(
      (1L, "a b a b a b", "A"), (2L, "a b a b", "A"), (3L, "a b c d", "A"),
      (4L, "c d c d e", "A"), (5L, "e e e q r", "A"), (6L, "q r z z w", "A"),
      (7L, "a b a b", "B"), (8L, "c d e", "B"), (9L, "w z q r", "B"),
      (10L, "lonely", "B")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.perplexityPartition(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("avg_nll_micro"), r.getAs[Int]("bucket"), r.getAs[String]("ppl_band")))
    assert(!out.exists(_._1 == 10L), "single-token doc must have no band")
    val byBand = out.groupBy(t => (t._2, t._5)).view.mapValues(_.length).toMap
    assert(byBand(("A", "head")) == 2 && byBand(("A", "middle")) == 2 && byBand(("A", "tail")) == 2)
    assert(byBand(("B", "head")) == 1 && byBand(("B", "middle")) == 1 && byBand(("B", "tail")) == 1)
    // bands are NLL-ordered within each source: max(head) <= min(middle) <= ...
    for (src <- Seq("A", "B")) {
      val g = out.filter(_._2 == src)
      def nlls(b: String) = g.filter(_._5 == b).map(_._3)
      assert(nlls("head").max <= nlls("middle").min)
      assert(nlls("middle").max <= nlls("tail").min)
    }
    // head = LOWEST perplexity (most fluent): bucket 1 is the head
    assert(out.filter(_._4 == 1).forall(_._5 == "head"))
  }
}
