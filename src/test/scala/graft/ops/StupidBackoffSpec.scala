package graft.ops

import graft.SparkTestBase

/** [[TextAnalysis.stupidBackoffLogProb]] — hand-computed NLLs on a
  * closed-form train/score pair, pinning every backoff rung (seen
  * trigram, trigram→bigram, trigram→bigram→unigram floor), the exact
  * α-nesting (0.4·(0.4·p), never 0.16·p), and the position-1/-2
  * scoring that keeps every doc present. */
class StupidBackoffSpec extends SparkTestBase {
  import spark.implicits._

  private def nllMicro(p: Double): Long =
    math.floor(-math.log(p) * 1e6 + 0.5).toLong

  // train corpus: "a b c a b d"
  // uni: a:2 b:2 c:1 d:1; N=6 V=4
  // bi:  (a,b):2 (b,c):1 (c,a):1 (b,d):1
  // tri: (a,b,c):1 (b,c,a):1 (c,a,b):1 (a,b,d):1
  private val train = Seq((100L, "a b c a b d"))

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val trainDf = train.toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffLogProb(
      docs.toDF("doc_id", "text"), "doc_id", "text", train = trainDf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    CachedRelations.releaseAll()
    out
  }

  test("seen trigram: raw relative frequencies, no penalty") {
    // "a b c": S(a)=(2+1)/10=0.3; S(b|a)=c(ab)/c(a)=2/2=1;
    //          S(c|a,b)=c(abc)/c(ab)=1/2
    val sum = nllMicro(0.3) + nllMicro(1.0) + nllMicro(0.5)
    assert(score(Seq((1L, "a b c")))(1L) == ((3L, sum, sum / 3)))
  }

  test("unseen trigram, seen bigram: one α") {
    // "b a b": S(b)=(2+1)/10=0.3; S(a|b): c(ba)=0 -> 0.4*S(a)=0.4*0.3;
    //          S(b|b,a): c(bab)=0 -> 0.4*S(b|a); c(ab)=2 -> 2/c(a)=1
    //          -> 0.4*1.0
    val sum = nllMicro(0.3) + nllMicro(0.4 * 0.3) + nllMicro(0.4 * 1.0)
    assert(score(Seq((2L, "b a b")))(2L) == ((3L, sum, sum / 3)))
  }

  test("unseen trigram AND bigram: nested α·(α·floor), not α²·floor") {
    // "a b a": S(a)=0.3; S(b|a)=1; S(a|a,b): c(aba)=0, c(ba)=0
    //          -> 0.4*(0.4*S(a)) = 0.4*(0.4*0.3)
    val sum = nllMicro(0.3) + nllMicro(1.0) + nllMicro(0.4 * (0.4 * 0.3))
    assert(score(Seq((3L, "a b a")))(3L) == ((3L, sum, sum / 3)))
  }

  test("OOV single token scores on the add-one floor; short docs present") {
    // "z": S(z)=(0+1)/10=0.1 — one unit. "c a": S(c)=0.2, S(a|c)=1/1.
    val out = score(Seq((4L, "z"), (5L, "c a")))
    assert(out(4L) == ((1L, nllMicro(0.1), nllMicro(0.1))))
    val s5 = nllMicro(0.2) + nllMicro(1.0)
    assert(out(5L) == ((2L, s5, s5 / 2)))
  }

  test("self-trained default never backs off and every doc appears") {
    val docs = Seq((1L, "a b c a"), (2L, "b c"), (3L, null.asInstanceOf[String]))
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoffLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CachedRelations.releaseAll()
    assert(out == Map(1L -> 4L, 2L -> 2L))
  }
}
