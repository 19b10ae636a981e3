package graft.ops

import graft.SparkTestBase

/** Flesch reading-ease: syllable heuristic, sentence floor, exact micros. */
class ReadabilitySpec extends SparkTestBase {

  test("readability: closed-form counts and score") {
    import spark.implicits._
    // "the cat sat. it purred." -> 2 sentences, 5 words
    // syllables: the=1 cat=1 sat=1 it=1 purred=2 ("u", "e") -> 6
    val df = Seq((1L, "The cat sat. It purred.")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    val wps = 5L * 1000000L / 2L
    val spw = 6L * 1000000L / 5L
    assert(r.getAs[Long]("wps_micro") == wps)
    assert(r.getAs[Long]("spw_micro") == spw)
    assert(r.getAs[Long]("flesch_micro") ==
      206835000L - (1015L * wps) / 1000L - (84600L * spw) / 1000L)
  }

  test("readability: no terminal punctuation -> one sentence; numerals count one syllable") {
    import spark.implicits._
    val df = Seq(
      (1L, "42 7 xyz"), // 3 words, no vowels -> 3 syllables (floor), 1 sentence
      (2L, "   "), // tokenless -> dropped
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.readability(df, "doc_id", "text").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    val r = rows.head
    assert(r.getAs[Long]("n_sentences") == 1L)
    assert(r.getAs[Long]("n_syllables") == 3L)
  }
}
