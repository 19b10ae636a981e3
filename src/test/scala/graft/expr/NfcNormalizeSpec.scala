package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** NFC composition expression + the normalizeText canonical chain.
  * All non-ASCII is written as \u escapes so the source encoding can
  * never silently change which form the fixtures are in. */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  test("nfc composes decomposed accents; composed and ASCII pass through; null-safe") {
    graft.functions.Registry.ensure(spark)
    // "Cafe" + combining U+0301 (decomposed) vs precomposed U+00E9
    val got = Seq(("Café", "Café", "plain", null: String))
      .toDF("a", "b", "c", "d")
      .select(call_function("nfc", col("a")).as("a"),
        call_function("nfc", col("b")).as("b"),
        call_function("nfc", col("c")).as("c"),
        call_function("nfc", col("d")).as("d"))
      .head()
    assert(got.getString(0) == "Café")
    assert(got.getString(1) == "Café")
    assert(got.getString(2) == "plain")
    assert(got.isNullAt(3))
  }

  test("nfkc folds compatibility variants nfc keeps apart") {
    graft.functions.Registry.ensure(spark)
    // U+FB01 LATIN SMALL LIGATURE FI + fullwidth digits U+FF14 U+FF12
    val df = Seq("\uFB01le \uFF14\uFF12").toDF("t")
    val nfkc = df.select(call_function("nfkc", col("t"))).head().getString(0)
    assert(nfkc == "file 42")
    // canonical nfc leaves both compatibility forms alone
    val nfc = df.select(call_function("nfc", col("t"))).head().getString(0)
    assert(nfc == "\uFB01le \uFF14\uFF12")
  }

  test("normalizeText: nfc -> lower -> whitespace collapse -> trim, in order") {
    // decomposed A + U+030A ring composes to U+00C5, lowers to U+00E5
    val df = Seq("  Ångström\t\tUnits  ").toDF("t")
    val out = df.select(graft.ops.TextAnalysis.normalizeText(spark, col("t")).as("n"))
      .head().getString(0)
    assert(out == "ångström units")
  }
}
