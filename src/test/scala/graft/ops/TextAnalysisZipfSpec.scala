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
}
