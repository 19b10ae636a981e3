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

  test("sentenceStats: split, counts, integral mean, terminal flag") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two. Three four five! six?  "),
      (2L, "no punct here"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_sent_tokens"),
          r.getAs[Long]("max_sent_tokens"), r.getAs[Long]("mean_sent_tokens_micro"),
          r.getAs[Boolean]("ends_terminal"))).toMap
    assert(out(1L) == (3L, 6L, 3L, 2000000L, true))
    assert(out(2L) == (1L, 3L, 3L, 3000000L, false))
    assert(out(3L) == (0L, 0L, 0L, 0L, false))
  }

  test("charEntropy: closed-form micro-nats; non-ASCII excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aab"),   // -(2/3 ln 2/3 + 1/3 ln 1/3) via micro quantization
      (2L, "ab"),    // uniform pair: ln 2
      (3L, "aé")) // accent stripped -> single char -> zero entropy
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ascii_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Long]("entropy_micro"))).toMap
    assert(out(1L) == (3L, 2L, (2L * 405465L + 1098612L) / 3L)) // 636514
    assert(out(2L) == (2L, 2L, 693147L))
    assert(out(3L) == (1L, 1L, 0L))
  }

  test("dupLineStats: occurrence counts, char shares, blank lines dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a\nbb\na\n\n cc "),
      (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.dupLineStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("dup_lines"),
          r.getAs[Long]("total_line_chars"), r.getAs[Long]("dup_line_chars"),
          r.getAs[Long]("dup_line_micro"), r.getAs[Long]("dup_char_micro"))).toMap
    assert(out(1L) == (4L, 2L, 6L, 2L, 500000L, 333333L))
    assert(out(2L) == (1L, 0L, 4L, 0L, 0L, 0L))
  }

  test("dupNgramCoverage: de-overlapped position coverage; hash twin identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"), // "a b" repeats -> positions {0,1,3,4} covered
      (2L, "x y z"),     // no repeated bigram
      (3L, "one")).toDF("doc_id", "text") // < n tokens: absent
    def run(portable: Boolean) =
      TextAnalysis.dupNgramCoverage(docs, "doc_id", "text", n = 2, portableHash = portable)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Long]("total_token_chars"),
            r.getAs[Long]("covered_positions"), r.getAs[Long]("covered_chars"),
            r.getAs[Long]("dup_char_micro"))).toMap
    val out = run(true)
    assert(out(1L) == (5L, 5L, 4L, 4L, 800000L))
    assert(out(2L) == (3L, 3L, 0L, 0L, 0L))
    assert(!out.contains(3L))
    assert(run(false) == out) // xxhash64 production twin is value-identical
  }

  test("hashEmbed: l2 weights exact; identical docs identical vectors") {
    import spark.implicits._
    val docs = Seq((1L, "alpha alpha beta"), (2L, "alpha alpha beta"),
      (3L, "gamma delta")).toDF("doc_id", "text")
    val long = TextAnalysis.hashEmbedLong(docs, "doc_id", "text", dims = 16)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    // doc 1: cnt 2 and 1 (or one bucket of 3 on collision); ss = 5 or 9
    val d1 = long(1L).map(r => (r.getAs[Long]("cnt"), r.getAs[Long]("weight_micro")))
    if (d1.length == 2) {
      val ss = math.sqrt(5.0)
      assert(d1.toSet == Set(
        (2L, math.floor(2e6 / ss + 0.5).toLong), (1L, math.floor(1e6 / ss + 0.5).toLong)))
    } else assert(d1.toSet == Set((3L, 1000000L)))
    // vectors: same text -> bitwise-identical vector; top neighbor cos = 1
    val vecs = TextAnalysis.hashEmbedVectors(docs, "doc_id", "text", dims = 16)
    val byId = vecs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getSeq[Float](1)).toMap
    assert(byId(1L) == byId(2L) && byId(1L) != byId(3L))
    val top = Similarity.bruteForceTopK(vecs.filter(col("doc_id") === 1), vecs,
      "doc_id", "embedding", k = 1).collect().head
    assert(top.getAs[Long]("nid") == 2L && math.abs(top.getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("fixMojibake: repairs double-encoded punctuation and accents") {
    import spark.implicits._
    // "don<rsquo-mojibake>t <e-acute-mojibake>t<e-acute-mojibake> a<nbsp-mojibake>b"
    val broken = "don\u00E2\u20AC\u2122t \u00C3\u00A9t\u00C3\u00A9 a\u00C2\u00A0b"
    val out = Seq((1L, broken), (2L, "clean text")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fixMojibake(col("text")).as("fixed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "don\u2019t \u00E9t\u00E9 a b")
    assert(out(2L) == "clean text")
    // the full repair table round-trips: every key maps to its value
    val all = graft.ops.TextAnalysis.mojibakeTable.map(_._1).mkString(" ")
    val want = graft.ops.TextAnalysis.mojibakeTable.map(_._2).mkString(" ")
    val fixedAll = Seq(Tuple1(all)).toDF("text")
      .select(TextAnalysis.fixMojibake(col("text"))).collect().head.getString(0)
    assert(fixedAll == want)
  }
}
