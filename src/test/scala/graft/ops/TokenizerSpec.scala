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
}
