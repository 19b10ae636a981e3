package graft.ops

import graft.SparkTestBase

/** Per-doc TF-IDF keyword extraction: weights, rank ties, k bound. */
class KeywordsSpec extends SparkTestBase {

  test("keywords: micro weights, deterministic tie-break, k bound") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry dog")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("wn"))).toMap
    def w(tf: Int, df: Int): Long =
      math.floor(tf * math.log(1.0 + 3.0 / df) * 1e6 + 0.5).toLong
    // d1: apple (tf2, df1) beats banana (tf1, df2)
    assert(got((1L, 1)) == (("apple", w(2, 1))))
    assert(got((1L, 2)) == (("banana", w(1, 2))))
    // d2: banana and cherry tie on weight -> term-asc tie-break
    assert(got((2L, 1)) == (("banana", w(1, 2))))
    assert(got((2L, 2)) == (("cherry", w(1, 2))))
    // d3: cherry tf3 outweighs rarer dog; k=2 caps the output
    assert(got((3L, 1)) == (("cherry", w(3, 2))))
    assert(got((3L, 2)) == (("dog", w(1, 1))))
    assert(got.size == 6)
  }
}
