package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Fingerprints.tokenWindowFp]] and the rolling ExactSubstr path:
  * the Rabin–Karp per-position window fingerprints must group windows
  * exactly like the window-STRING hash they replace. */
class TokenWindowFpSpec extends SparkTestBase {
  import spark.implicits._

  private def fps(text: String, l: Int): Seq[Long] = {
    graft.functions.Registry.ensure(spark)
    Seq(text).toDF("t")
      .select(call_function("token_window_fp_x64", col("t"), lit(l)).as("f"))
      .collect().head.getSeq[Long](0)
  }

  test("window count is T-L+1; short docs yield no windows") {
    assert(fps("a b c d e", 3).length == 3)
    assert(fps("a b", 3).isEmpty)
    assert(fps("a b c", 3).length == 1)
  }

  test("l < 1 from direct SQL yields empty, not AIOOBE") {
    assert(fps("a b c", 0).isEmpty)
    assert(fps("a b c", -2).isEmpty)
  }

  test("equal windows agree, across positions and documents") {
    val f1 = fps("x y z a b c", 3)
    val f2 = fps("p q a b c r", 3)
    // window "a b c" is position 3 (0-based) in doc1, position 2 in doc2
    assert(f1(3) == f2(2))
    // repeated window within one doc agrees with itself
    val f3 = fps("a b c d a b c", 3)
    assert(f3(0) == f3(4))
    // distinct windows disagree
    assert(f1.distinct.length == f1.length)
  }

  test("tokenization parity with word_grams (trim, whitespace runs, case)") {
    graft.functions.Registry.ensure(spark)
    val text = "  The quick\tBROWN  fox jumps  "
    val viaStrings = Seq(text).toDF("t")
      .select(explode(call_function("word_grams", col("t"), lit(3), lit(1))).as("g"))
      .select(xxhash64(col("g")))
      .collect().map(_.getLong(0))
    val rolled = fps(text, 3)
    // the two hash schemes differ in VALUE but must induce the same
    // equality classes: same count, and equal positions <=> equal strings
    assert(viaStrings.length == rolled.length)
    assert(viaStrings.toSeq.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
      == rolled.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet)
  }

  test("rolling ExactSubstr output == word-gram ExactSubstr output") {
    val span = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"prefix alpha $span tail one"),
      (2L, s"$span completely different ending here"),
      (3L, "short untouched document")).toDF("doc_id", "text")
    def run(rolling: Boolean) =
      graft.ops.Dedup.exactSubstrDedup(docs, "doc_id", "text",
          windowTokens = 8, rollingFp = rolling)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    assert(run(rolling = true) == run(rolling = false))
    // and the duplicated span was actually removed from the later doc
    val cleaned = run(rolling = true)
    assert(!cleaned(1)._2.contains("three four five"))
  }
}
