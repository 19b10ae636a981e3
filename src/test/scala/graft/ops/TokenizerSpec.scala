package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE trainer invariants on the standard hug/pug/hugs teaching
  * fixture (pair counts, merge order, deterministic tie-breaks,
  * non-overlapping merge application). */
class TokenizerSpec extends SparkTestBase {

  private def corpus = {
    import graft.SparkTestSession.spark.implicits._
    // word frequencies: hug x10, pug x5, hugs x5
    (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(5)("hugs"))
      .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("bpePairCounts: weighted char-pair counts") {
    val out = bpeCounts()
    assert(out == Map("hu" -> 15L, "ug" -> 20L, "pu" -> 5L, "gs" -> 5L))
  }

  private def bpeCounts(): Map[String, Long] =
    Tokenizer.bpePairCounts(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("bpeTrain: merge order, tie-break, early stop") {
    val merges = Tokenizer.bpeTrain(corpus, "text", numMerges = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: (u,g)=20 wins; round 2: (h,ug)=15; round 3 ties at 5 —
    // (hug,s) < (p,ug) lexicographically on the left symbol
    assert(merges.toSeq == Seq(
      (1, "u", "g", "ug", 20L),
      (2, "h", "ug", "hug", 15L),
      (3, "hug", "s", "hugs", 5L)))
  }

  test("bpeTrain: non-overlapping left-to-right merge application") {
    import graft.SparkTestSession.spark.implicits._
    // "aaa": merge (a,a) counts 2 adjacencies in round 1; after fusing
    // left-to-right the word is [aa, a], so round 2 sees (aa, a)
    val docs = Seq("aaa").toDF("text")
    val merges = Tokenizer.bpeTrain(docs, "text", numMerges = 5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(
      (1, "a", "a", 2L),
      (2, "aa", "a", 1L)))
  }

  test("bpeTrain: maxVocab cap keeps the most frequent words") {
    import graft.SparkTestSession.spark.implicits._
    val docs = Seq.fill(10)("xy xy zq").toDF("text")
    // cap at 1 word: only "xy" (freq 20) survives -> single merge (x,y)
    val merges = Tokenizer.bpeTrain(docs, "text", numMerges = 5, maxVocab = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(("x", "y", 20L)))
  }

  test("applyMerges: rank order, left-to-right non-overlap, chained merges") {
    // (a,a) on "aaa": leftmost pair fuses, no overlap -> [aa, a]
    assert(Tokenizer.applyMerges("aaa", Seq(("a", "a"))).toSeq == Seq("aa", "a"))
    // rank order matters: (a,b) then (ab,c) chains into one token
    assert(Tokenizer.applyMerges("abc", Seq(("a", "b"), ("ab", "c"))).toSeq == Seq("abc"))
    // reversed priority: (b,c) fuses first, (a,b) then finds no pair
    assert(Tokenizer.applyMerges("abc", Seq(("b", "c"), ("a", "b"))).toSeq == Seq("a", "bc"))
    assert(Tokenizer.applyMerges("x", Seq(("a", "b"))).toSeq == Seq("x"))
    // parity with the trainer: encoding the training corpus under the
    // learned merges reproduces the trainer's own final segmentation
    // ("aaab" x3: merge 1 = (a,a) cnt 6 -> [aa,a,b]; merge 2 tie
    // (a,b) vs (aa,a) both 3 -> (a,b) by (left, right) asc)
    assert(Tokenizer.applyMerges("aaab", Seq(("a", "a"), ("a", "b"))).toSeq
      == Seq("aa", "ab"))
  }

  test("bpeSegmentVocab + bpeFertility: closed-form counts and integral ratios") {
    import graft.SparkTestSession.spark.implicits._
    val docs = Seq(
      ("s1", "aa aa bb"), ("s1", "aa"), ("s2", "abab cc")).toDF("source", "text")
    val merges = Seq(("a", "a"), ("b", "b"))
    val seg = Tokenizer.bpeSegmentVocab(docs, "text", merges)
      .collect().map(r => r.getAs[String]("w") ->
        (r.getAs[Long]("freq"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))).toMap
    assert(seg("aa") == ((3L, 1L, 2L)))   // fused by (a,a)
    assert(seg("bb") == ((1L, 1L, 2L)))   // fused by (b,b)
    assert(seg("abab") == ((1L, 4L, 4L))) // neither merge applies
    assert(seg("cc") == ((1L, 2L, 2L)))
    val fert = Tokenizer.bpeFertility(docs, "text", "source", merges)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
         r.getAs[Long]("fertility_micro"), r.getAs[Long]("chars_per_token_micro"))).toMap
    // s1: words aa,aa,bb,aa -> 4 words, tokens 1+1+1+1 = 4, chars 8
    assert(fert("s1") == ((4L, 4L, 1000000L, 2000000L)))
    // s2: abab (4 tokens) + cc (2 tokens) -> 2 words, 6 tokens, 6 chars
    assert(fert("s2") == ((2L, 6L, 3000000L, 1000000L)))
  }
}
