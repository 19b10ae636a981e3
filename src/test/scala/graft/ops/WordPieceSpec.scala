package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WordPiece family invariants on a closed-form fixture: the
  * likelihood-ratio score n/(fa*fb) (exact BigInt compare, score
  * ties broken (left, right) ascending), ##-prefix symbol algebra,
  * greedy longest-match-first inference with the all-or-nothing
  * [UNK] rule, the full-alphabet character seed, and the per-source
  * fertility report. Corpus: ab x2, abc x1, b x2 — every round's
  * score table is hand-computable (two of three rounds TIE on the
  * ratio 1/3, so the deterministic tie-break is load-bearing). */
class WordPieceSpec extends SparkTestBase {

  private def corpus = {
    import graft.SparkTestSession.spark.implicits._
    Seq("ab ab abc", "b b").toDF("text")
  }

  test("wordpiecePairScores: iteration-zero counts and symbol freqs") {
    val rows = Tokenizer.wordpiecePairScores(corpus, "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // symbols: a(3) ##b(3) ##c(1) b(2); pairs: (a,##b)=3, (##b,##c)=1
    assert(rows == Set(
      ("a", "##b", 3L, 3L, 3L),
      ("##b", "##c", 1L, 3L, 1L)))
  }

  test("wordpieceTrain: score ratio, BigInt tie-break, ## symbol algebra") {
    val merges = Tokenizer.wordpieceTrain(corpus, "text", numMerges = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // round 1: score(a,##b)=3/9, score(##b,##c)=1/3 — EXACT tie; the
    //   (left,right)-ascending break picks (##b,##c) ("#" < "a"),
    //   merged keeps the left prefix and strips the right's: ##bc
    // round 2: score(a,##b)=2/6, score(a,##bc)=1/3 — tie again;
    //   ##b < ##bc picks (a,##b) -> ab
    // round 3: only (a,##bc)=1/(1*1) -> abc; round 4: no pairs, stop
    assert(merges.toSeq == Seq(
      (1, "##b", "##c", "##bc", 1L, 3L, 1L),
      (2, "a", "##b", "ab", 2L, 3L, 2L),
      (3, "a", "##bc", "abc", 1L, 1L, 1L)))
  }

  test("wordpieceVocabFrom: merged symbols plus both char forms") {
    val vocab = Tokenizer.wordpieceVocabFrom(corpus, "text", numMerges = 10)
    assert(vocab == Set("a", "b", "c", "##a", "##b", "##c", "##bc", "ab", "abc"))
  }

  private val fixtureVocab =
    Set("a", "b", "c", "##a", "##b", "##c", "##bc", "ab", "abc")

  test("wordpieceEncode: greedy longest-match-first") {
    assert(Tokenizer.wordpieceEncode("abc", fixtureVocab).toSeq == Seq("abc"))
    assert(Tokenizer.wordpieceEncode("ab", fixtureVocab).toSeq == Seq("ab"))
    // longest match at 0 is "abc", then continuation ##b
    assert(Tokenizer.wordpieceEncode("abcb", fixtureVocab).toSeq == Seq("abc", "##b"))
    // word-internal pieces need the ## form: "ba" -> b, ##a
    assert(Tokenizer.wordpieceEncode("ba", fixtureVocab).toSeq == Seq("b", "##a"))
    assert(Tokenizer.wordpieceEncode("", fixtureVocab).toSeq == Seq.empty)
  }

  test("wordpieceEncode: all-or-nothing [UNK], even after a partial match") {
    // no 'x' anywhere in the vocab
    assert(Tokenizer.wordpieceEncode("xyz", fixtureVocab).toSeq == Seq("[UNK]"))
    // 'a' matches at position 0 but ##x cannot — the WHOLE word is UNK
    assert(Tokenizer.wordpieceEncode("axz", fixtureVocab).toSeq == Seq("[UNK]"))
  }

  test("full-alphabet char seed: maxVocab-capped training still covers every word") {
    import graft.SparkTestSession.spark.implicits._
    val docs = Seq.fill(10)("xy xy zq").toDF("text")
    // cap keeps only "xy" for merge learning, but the char seed comes
    // from the FULL distinct-word relation, so "zq" still encodes
    val vocab = Tokenizer.wordpieceVocabFrom(docs, "text", numMerges = 5, maxVocab = 1)
    assert(Tokenizer.wordpieceEncode("zq", vocab).toSeq == Seq("z", "##q"))
    assert(Tokenizer.wordpieceEncode("xy", vocab).toSeq == Seq("xy"))
  }

  test("training-corpus reconstruction: zero UNK, concat reproduces each word") {
    import graft.SparkTestSession.spark.implicits._
    val docs = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(5)("hugs")
      ++ Seq("café", "naïve"))
      .grouped(3).map(_.mkString(" ")).toSeq.toDF("text")
    val vocab = Tokenizer.wordpieceVocabFrom(docs, "text", numMerges = 6)
    val words = docs.select(explode(Dedup.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    for (w <- words) {
      val toks = Tokenizer.wordpieceEncode(w, vocab)
      assert(!toks.sameElements(Array("[UNK]")), s"UNK on training word '$w'")
      assert(toks.map(_.stripPrefix("##")).mkString == w,
        s"reconstruction failed for '$w': ${toks.mkString("|")}")
    }
  }

  test("wordpieceFertility: per-source counters including unk_words") {
    import graft.SparkTestSession.spark.implicits._
    val docs = Seq(("s1", "ab abc"), ("s2", "b qq")).toDF("source", "text")
    val out = Tokenizer.wordpieceFertility(docs, "text", "source", fixtureVocab)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // s1: ab->[ab], abc->[abc]: 2 words, 2 tokens, 5 chars, 0 unk
    // s2: b->[b], qq->[UNK] (counts 1 token): 2 words, 2 tokens, 3 chars, 1 unk
    assert(out.toSeq == Seq(
      ("s1", 2L, 2L, 5L, 0L, 1000000L, 2500000L),
      ("s2", 2L, 2L, 3L, 1L, 1000000L, 1500000L)))
  }
}
