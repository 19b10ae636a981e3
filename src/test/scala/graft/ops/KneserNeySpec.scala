package graft.ops

import graft.SparkTestBase

/** [[TextAnalysis.kneserNeyLogProb]] — hand-computed interpolated
  * Kneser-Ney NLLs on a closed-form corpus, pinning the count tables
  * (bigram types, context totals, distinct continuations), the D=0.75
  * discount arithmetic, the add-one continuation floor, and the
  * continuation-vs-frequency distinction that IS Kneser-Ney. */
class KneserNeySpec extends SparkTestBase {
  import spark.implicits._

  private def nllMicro(p: Double): Long =
    math.floor(-math.log(p) * 1e6 + 0.5).toLong

  test("closed-form corpus: every transition and first token as hand-computed") {
    // corpus: doc1 "a b a b", doc2 "c b"
    // transitions: (a,b)x2, (b,a)x1, (c,b)x1
    // big types: (a,b) cab=2, (b,a) cab=1, (c,b) cab=1   -> B=3
    // ctx: a: ca=2 n1prev=1 | b: ca=1 n1prev=1 | c: ca=1 n1prev=1
    // cont: b: n1cur=2 (follows a, c) | a: n1cur=1
    // vocab V=3 (a, b, c); B+V=6
    // P_cont(b)=(2+1)/6=0.5  P_cont(a)=(1+1)/6=1/3  P_cont(c)=(0+1)/6
    val df = Seq((1L, "a b a b"), (2L, "c b")).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // doc1 "a b a b": first 'a' -> P_cont(a)=1/3
    //  (a,b): max(2-.75,0)/2 + (.75*1/2)*.5 = .625 + .1875 = .8125
    //  (b,a): max(1-.75,0)/1 + (.75*1/1)*(1/3) = .25 + .25 = .5
    //  (a,b) again
    val d1 = nllMicro(1.0 / 3) + 2 * nllMicro(0.8125) + nllMicro(0.5)
    assert(out(1L) == ((4L, d1, d1 / 4)))

    // doc2 "c b": first 'c' -> P_cont(c)=1/6 (c never follows anything
    //   — the add-one floor keeps it finite)
    //  (c,b): max(1-.75,0)/1 + (.75*1/1)*.5 = .25 + .375 = .625
    val d2 = nllMicro(1.0 / 6) + nllMicro(0.625)
    assert(out(2L) == ((2L, d2, d2 / 2)))
  }

  test("continuation beats frequency: the Kneser-Ney signature") {
    // 'x' is FREQUENT (appears 6 times) but only ever follows 'q';
    // 'y' appears 3 times after 3 distinct contexts. A frequency
    // backoff would rank P(x) > P(y); continuation ranks y > x.
    val df = Seq(
      (1L, "q x q x q x q x q x q x"),
      (2L, "a y b y c y")).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogProb(df, "doc_id", "text")
    // recover P_cont via the first-token NLL of probe docs
    val probe = Seq((10L, "x"), (11L, "y")).toDF("doc_id", "text")
    val both = TextAnalysis.kneserNeyLogProb(df.unionByName(probe), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(both(11L) < both(10L),
      s"P_cont(y) should exceed P_cont(x): nll y=${both(11L)} x=${both(10L)}")
    assert(out.count() == 2)
  }

  test("single-token doc scores on the continuation floor; null text absent") {
    val df = Seq((1L, "a b"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}
