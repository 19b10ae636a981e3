package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

class FingerprintsSpec extends SparkTestBase {
  import spark.implicits._

  private def reg(): Unit = graft.functions.Registry.ensure(spark)

  test("minhash_sig_x64: slot values are min over shingles of XXH64.hashLong(shingleHash, j)") {
    reg()
    val text = "abcdefg" // k=5 -> shingles abcde, bcdef, cdefg
    val got = Seq(text).toDF("t")
      .select(call_function("minhash_sig_x64", col("t"), lit(5), lit(4)).as("sig"))
      .head().getSeq[Long](0)
    val shingles = Seq("abcde", "bcdef", "cdefg")
    val want = (0 until 4).map { j =>
      shingles.map { sh =>
        val b = sh.getBytes("UTF-8")
        XXH64.hashLong(XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L), j)
      }.min
    }
    assert(got == want)
  }

  test("minhash_sig_x64: lowercases, always numHashes slots, null text -> null") {
    reg()
    val df = Seq(("a", "HeLLo WoRld"), ("b", "hello world"), ("c", null))
      .toDF("id", "t")
      .select(col("id"), call_function("minhash_sig_x64", col("t"), lit(5), lit(16)).as("sig"))
    val rows = df.collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(rows("a").get == rows("b").get) // case-insensitive
    assert(rows("a").get.length == 16)
    assert(rows("c").isEmpty)
    // text shorter than k still yields a full signature (whole-text shingle)
    val short = Seq("ab").toDF("t")
      .select(call_function("minhash_sig_x64", col("t"), lit(5), lit(16)).as("sig"))
      .head().getSeq[Long](0)
    assert(short.length == 16)
  }

  test("rolling_fp_x64: sorted, distinct, every element samples to 0 mod modulus") {
    reg()
    val corpus = (1 to 50).map(i => s"document number $i with enough text to sample from repeatedly")
    val out = corpus.toDF("t")
      .select(call_function("rolling_fp_x64", col("t"), lit(8), lit(16)).as("fp"))
      .collect().map(_.getSeq[Long](0))
    assert(out.exists(_.nonEmpty), "expected at least one non-empty sample across 50 docs")
    out.foreach { fp =>
      assert(fp == fp.sorted, "fingerprint must be sorted")
      assert(fp.distinct == fp, "fingerprint must be distinct")
      fp.foreach(h => assert(java.lang.Math.floorMod(h, 16L) == 0L))
    }
  }

  test("winnow_fp_x64: shared substring of length >= w+k-1 guarantees a shared hash") {
    reg()
    val shared = "the quick brown fox jumps over" // 30 chars >= 8+4-1
    val a = s"AAAA zzz $shared 123"
    val b = s"completely different prefix $shared and suffix"
    val c = "nothing in common with either document at all!"
    val fps = Seq(("a", a), ("b", b), ("c", c)).toDF("id", "t")
      .select(col("id"), call_function("winnow_fp_x64", col("t"), lit(8), lit(4)).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps("a") intersect fps("b")).nonEmpty,
      "winnowing guarantee: docs sharing a >= w+k-1 substring share a fingerprint hash")
    assert((fps("a") intersect fps("c")).isEmpty)
  }

  test("winnow_fp_x64: fewer than w shingles -> empty; DataFrame op drops such docs") {
    reg()
    val tiny = Seq("abcdefgh").toDF("t") // exactly 1 shingle at k=8 < w=4
      .select(call_function("winnow_fp_x64", col("t"), lit(8), lit(4)).as("fp"))
      .head().getSeq[Long](0)
    assert(tiny.isEmpty)
    val df = Seq(("t1", "abcdefgh"), ("t2", "a much longer document that has plenty of shingles"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.winnowingFingerprint(df, "doc_id", "text",
      portableHash = false)
    assert(out.select("doc_id").as[String].collect().toSeq == Seq("t2"))
  }

  test("word_gram_hashes: value-identical to the builtin tokenize/slice/join/xxhash64 construction") {
    reg()
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing spaces  ",
      "tab\tseparated\ttokens here",
      "mixed \t whitespace\n runs \r\n everywhere",
      "one",
      "two words",
      "",
      "   ",
      "ÜNICODE Text ÉΛΛHNIKA tokens",
      "a  b   c    d", // multi-space runs
      "\ttab-led", // leading non-space whitespace survives SQL trim
      "trailing-tab\t")
    for (n <- Seq(2, 3, 5)) {
      val df = texts.toDF("t")
      val builtin = {
        val toks = split(lower(trim(col("t"))), "\\s+")
        array_distinct(
          transform(sequence(lit(0), greatest(lit(0), size(toks) - n)),
            i => xxhash64(array_join(slice(toks, i + 1, lit(n)), " "))))
      }
      val rows = df.select(
          builtin.as("want"),
          call_function("word_gram_hashes", col("t"), lit(n)).as("got"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](0), s"n=$n text='$t'")
      }
    }
  }

  test("word_grams: value-identical to the builtin tokenize/slice/join construction") {
    reg()
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing spaces  ",
      "tab\tseparated\ttokens here",
      "mixed \t whitespace\n runs \r\n everywhere",
      "one",            // fewer tokens than n -> EMPTY (vocabulary semantics)
      "two words",
      "",
      "   ",
      "ÜNICODE Text ÉΛΛHNIKA tokens",
      "a  b   c    d",
      "\ttab-led",
      "the the the")    // repeated gram kept with multiplicity
    for (n <- Seq(2, 3)) {
      val df = texts.toDF("t")
      val builtin = {
        val toks = split(lower(trim(col("t"))), "\\s+")
        val m = size(toks) - lit(n - 1)
        when(m >= 1, transform(sequence(lit(1), m), i => array_join(slice(toks, i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))
      }
      val rows = df.select(
          builtin.as("want"),
          call_function("word_grams", col("t"), lit(n)).as("got"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](1) == r.getSeq[String](0), s"n=$n text='$t'")
      }
    }
  }

  test("word_grams with step: chunk semantics match the ceil/slice construction") {
    reg()
    val texts = Seq(
      "a b c d e f g h i j k",  // 11 tokens: partial tail chunk
      "a b c",                  // fewer than n: one short chunk
      "one",
      "  x  y  ",
      "exactly four word toks")
    for (n <- Seq(3, 4, 8)) {
      val df = texts.toDF("t")
      val builtin = {
        val toks = split(lower(trim(col("t"))), "\\s+")
        val nSpans = greatest(ceil(size(toks).cast("double") / n).cast("int"), lit(1))
        transform(sequence(lit(0), nSpans - 1),
          i => array_join(slice(toks, i * n + 1, lit(n)), " "))
      }
      val rows = df.select(
          builtin.as("want"),
          call_function("word_grams", col("t"), lit(n), lit(n)).as("got"))
        .collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](1) == r.getSeq[String](0), s"n=$n text='$t'")
      }
    }
  }

  test("fingerprint queries plan as narrow map stages: no Exchange, no ScalaUDF") {
    reg()
    val df = Seq(("d1", "some document text for the plan shape check")).toDF("doc_id", "text")
    for (q <- Seq(
        graft.ops.Dedup.minhashSignatures(df, "doc_id", "text", 5, 16),
        graft.ops.TextAnalysis.rollingFingerprint(df, "doc_id", "text", portableHash = false),
        graft.ops.TextAnalysis.winnowingFingerprint(df, "doc_id", "text", portableHash = false))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"doc-local fingerprint must not shuffle:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"native expression expected:\n$plan")
    }
  }
}
