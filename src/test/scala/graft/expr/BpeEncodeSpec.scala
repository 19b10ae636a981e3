package graft.expr

import graft.SparkTestBase
import graft.ops.Tokenizer
import org.apache.spark.sql.functions._

/** [[BpeEncode]] (native min-rank loop) must be token-for-token
  * equivalent to [[Tokenizer.applyMerges]] (sequential rank-order
  * passes) — the equivalence the expression's scaladoc argues. */
class BpeEncodeSpec extends SparkTestBase {
  import spark.implicits._

  private def nativeEncode(words: Seq[String],
                           merges: Seq[(String, String)]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), Tokenizer.bpeEncodeCol(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("equivalence vs applyMerges on a trained table over real-ish text") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the brown dog sleeps while the quick fox runs",
      "lower lowest newer newest wider widest",
      "aaaa aaab abab banana bandana antenna",
      "repetition repetition repetition of the same words builds merges"
    ).toDF("text")
    val merges = Tokenizer.bpeTrain(docs, "text", numMerges = 200)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq ++
      Seq("unseenword", "zzz", "a", "", "banana")
    val native = nativeEncode(words, merges)
    words.filter(_.nonEmpty).foreach { w =>
      assert(native(w) == Tokenizer.applyMerges(w, merges).toSeq,
        s"word '$w': native ${native(w)} != applyMerges ${Tokenizer.applyMerges(w, merges).toSeq}")
    }
  }

  test("edge cases: empty word, single char, overlapping same-pair runs, unicode") {
    val merges = Seq(("a", "a"), ("aa", "a"), ("b", "c"), ("é", "x"))
    val words = Seq("", "a", "aaa", "aaaa", "aaaaa", "abc", "bcbc", "éxé", "ééxx")
    val native = nativeEncode(words, merges)
    words.foreach { w =>
      assert(native(w) == Tokenizer.applyMerges(w, merges).toSeq, s"word '$w'")
    }
    // under the full table, (a,a) then (aa,a) chain: [aa,a] -> [aaa]
    assert(native("aaa") == Seq("aaa"))
    // "aaaa" -> (a,a) leaves [aa,aa]; no (aa,aa) merge exists
    assert(native("aaaa") == Seq("aa", "aa"))
    // the classic non-overlap contract in isolation: only (a,a) learned
    assert(nativeEncode(Seq("aaa"), Seq(("a", "a")))("aaa") == Seq("aa", "a"))
  }

  test("rank order beats left-to-right greed: lower-rank pair wins even later in the word") {
    // merges: rank0 (b,c), rank1 (a,b). "abc": applyMerges does (b,c)
    // first -> [a, bc]; a greedy leftmost-pair encoder would do (a,b)
    // -> [ab, c]. The native loop must pick rank 0.
    val merges = Seq(("b", "c"), ("a", "b"))
    assert(nativeEncode(Seq("abc"), merges)("abc") == Seq("a", "bc"))
    assert(Tokenizer.applyMerges("abc", merges).toSeq == Seq("a", "bc"))
  }

  test("1000-merge table: equivalence holds and the fertility twin agrees with the UDF path") {
    val docs = graft.queries.Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val merges = Tokenizer.bpeTrain(docs, "text", numMerges = 1000)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val sample = docs.select(explode(graft.ops.Dedup.tokens(col("text"))).as("w"))
      .distinct().limit(300).as[String].collect().toSeq
    val native = nativeEncode(sample, merges)
    sample.foreach { w =>
      assert(native(w) == Tokenizer.applyMerges(w, merges).toSeq, s"word '$w'")
    }
    // whole-pipeline agreement: fertility via native == fertility via UDF
    val a = Tokenizer.bpeFertility(docs, "text", "source", merges, nativeEncode = true)
      .orderBy("source").collect().map(_.toSeq)
    val b = Tokenizer.bpeFertility(docs, "text", "source", merges, nativeEncode = false)
      .orderBy("source").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
