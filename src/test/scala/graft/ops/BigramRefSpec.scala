package graft.ops

import graft.SparkTestBase

/** [[TextAnalysis.bigramLogProbRef]] — the reference-trained CCNet
  * perplexity filter: hand-computed NLLs on a closed-form model,
  * including the paths the self-fit [[TextAnalysis.bigramLogProb]]
  * cannot produce (unseen word, unseen context, single-token doc). */
class BigramRefSpec extends SparkTestBase {
  import spark.implicits._

  // train corpus "a b a b": uni a:2 b:2 (N=4, V=2); big (a,b):2 (b,a):1
  private val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
  private def nllMicro(p: Double): Long =
    math.floor(-math.log(p) * 1e6 + 0.5).toLong

  private def score(text: String): (Long, Long, Long) = {
    val r = TextAnalysis.bigramLogProbRef(
        Seq((9L, text)).toDF("doc_id", "text"), "doc_id", "text", train)
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("seen transition: first-token unigram + interpolated bigram") {
    // "a b": first a -> pu=(2+1)/6=0.5; (a,b) -> 0.9*(2/2)+0.1*(2+1)/6=0.95
    assert(score("a b") ==
      ((2L, nllMicro(0.5) + nllMicro(0.95), (nllMicro(0.5) + nllMicro(0.95)) / 2)))
  }

  test("single-token doc scores (the self-fit model drops it)") {
    assert(score("a") == ((1L, nllMicro(0.5), nllMicro(0.5))))
  }

  test("unseen word floors at add-one unigram") {
    // "z": pu=(0+1)/6
    assert(score("z") == ((1L, nllMicro(1.0 / 6), nllMicro(1.0 / 6))))
  }

  test("seen context, unseen continuation: bigram term zero, unigram floor carries") {
    // "b z": first b -> 0.5; (b,z): ca=1>0, cab=0 -> p = 0.1*(0+1)/6
    val expectedTrans = nllMicro(0.9 * 0.0 + 0.1 * (1.0 / 6))
    assert(score("b z") == ((2L, nllMicro(0.5) + expectedTrans,
      (nllMicro(0.5) + expectedTrans) / 2)))
  }

  test("empty training corpus: docs keep token counts, nll columns are null") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProbRef(
        Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text", empty)
      .collect().head
    assert(r.getLong(1) == 2L && r.isNullAt(2) && r.isNullAt(3))
  }

  test("unseen context: bigram term zero via the null-ca guard") {
    // "z b": first z -> 1/6; (z,b): ca null -> p = 0.1*(2+1)/6 = 0.05
    assert(score("z b") == ((2L, nllMicro(1.0 / 6) + nllMicro(0.05),
      (nllMicro(1.0 / 6) + nllMicro(0.05)) / 2)))
  }
}
