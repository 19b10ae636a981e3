package graft.ops

import graft.SparkTestBase

/** The C4 cleaner (Raffel 2020 §2.2) on directed fixtures: every line
  * rule (terminal punctuation, min words, javascript), every page rule
  * (lorem ipsum, curly brace, min retained sentences, all-lines-gone),
  * and the counters. */
class C4RulesSpec extends SparkTestBase {
  import graft.SparkTestSession.spark.implicits._

  private def run(rows: Seq[(Long, String)],
                  minWords: Int = 3, minSents: Int = 2) =
    TextAnalysis.c4LineRules(rows.toDF("doc_id", "text"), "doc_id", "text",
      minWordsPerLine = minWords, minSentences = minSents)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("line rules: terminal punctuation, min words, javascript") {
    val text = Seq(
      "This line ends properly.",          // kept
      "No terminal punctuation here",      // dropped: no [.!?"]
      "Too short.",                        // dropped: 2 words < 3
      "Enable javascript to continue.",    // dropped: javascript
      "He said \"use quotes\"",            // kept: ends in a quote
      "A third proper sentence here!"      // kept
    ).mkString("\n")
    val out = run(Seq((1L, text)))
    val (clean, kept, total, sents) = out(1L)
    assert(clean == Seq("This line ends properly.",
      "He said \"use quotes\"",
      "A third proper sentence here!").mkString("\n"))
    assert(kept == 3 && total == 6)
    // sentences of the RETAINED text: the quote-terminated line has no
    // [.!?] of its own, so it merges into the following segment —
    // two non-blank [.!?]+-delimited segments total
    assert(sents == 2)
  }

  test("page rules: lorem ipsum, curly brace, min sentences, empty survivors vanish") {
    val out = run(Seq(
      (1L, "Fine first sentence here. Fine second sentence here."),
      (2L, "Contains Lorem Ipsum filler text. And more text here."),
      (3L, "Some code { inside } the page. And more text here."),
      (4L, "Only one proper sentence here."),      // < 2 sentences
      (5L, "no terminal\nanother bare line")))     // every line dropped
    assert(out.keySet == Set(1L))
    assert(out(1L)._1 == "Fine first sentence here. Fine second sentence here.")
  }

  test("null text and whitespace-only lines handled") {
    val out = run(Seq((1L, null), (2L, "  \n  Good sentence number one.  \nGood sentence number two.")),
      minSents = 2)
    assert(out.keySet == Set(2L))
    val (clean, kept, total, sents) = out(2L)
    assert(kept == 2 && total == 2 && sents == 2)
    assert(clean == "Good sentence number one.\nGood sentence number two.")
  }
}
