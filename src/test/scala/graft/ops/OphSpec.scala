package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** One-permutation-hashing MinHash: densification arithmetic, pair
  * semantics, portable/x64 twin identity. */
class OphSpec extends SparkTestBase {

  /** JVM replica of the portable hash: first 15 hex chars of md5 as a long. */
  private def md5h(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  test("ophSignatures: single-shingle doc densifies every bin by cyclic borrow + t*C") {
    import spark.implicits._
    val k = 8
    val df = Seq((1L, "abcd")).toDF("doc_id", "text") // exactly one 4-shingle
    val sig = Dedup.ophSignatures(df, "doc_id", "text", shingleSize = 4, k = k,
        portableHashing = true)
      .collect().head.getAs[scala.collection.Seq[Long]]("sig")
    val h = md5h("abcd")
    val bin = (h % k).toInt
    val v = h / k
    val expected = (0 until k).map { j =>
      val t = (bin - j + k) % k
      v + t * Dedup.OphBorrowOffset
    }
    assert(sig.toSeq == expected)
  }

  test("ophSignatures: multi-shingle doc takes the min quotient per bin") {
    import spark.implicits._
    val k = 8
    val text = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val sig = Dedup.ophSignatures(df, "doc_id", "text", shingleSize = 4, k = k,
        portableHashing = true)
      .collect().head.getAs[scala.collection.Seq[Long]]("sig")
    val shingles = (1 to math.max(1, text.length - 3))
      .map(i => text.toLowerCase.substring(i - 1, math.min(i + 3, text.length))).distinct
    val binMin = shingles.map(md5h).groupBy(h => (h % k).toInt)
      .map { case (b, hs) => b -> hs.map(_ / k).min }
    val expected = (0 until k).map { j =>
      val t = (0 until k).find(t => binMin.contains((j + t) % k)).get
      binMin((j + t) % k) + t * Dedup.OphBorrowOffset
    }
    assert(sig.toSeq == expected)
  }

  test("ophVerifiedPairs: exact Jaccard confirms true pairs and kills banding noise") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat and purred all day long"),
      (2L, "the cat sat on the mat and purred all day long"),
      (3L, "completely different text about zebras and xylophones")
    ).toDF("doc_id", "text")
    val got = Dedup.ophVerifiedPairs(df, "doc_id", "text", portableHashing = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == ((1.0, 1000000L))) // identical: est 1.0, exact 1e6
    // a candidate surviving the estimator but failing exact verify drops:
    // force with exactThreshold above the identical-pair ceiling impossible;
    // instead assert the threshold gates (exact = 1e6 < 1.1e6 is unrepresentable,
    // so gate at a value the pair can't reach via estThreshold drop)
    val strict = Dedup.ophVerifiedPairs(df, "doc_id", "text",
      estThreshold = 0.2, exactThreshold = 0.99, portableHashing = true)
    assert(strict.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("ophPairs: identical docs pair at est_jaccard 1.0; unrelated doc stays out; twins agree") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat and purred all day long"),
      (2L, "the cat sat on the mat and purred all day long"),
      (3L, "zzzz qqqq wwww xxxx kkkk ffff gggg hhhh jjjj")
    ).toDF("doc_id", "text")
    def pairSet(portable: Boolean) =
      Dedup.ophPairs(df, "doc_id", "text", portableHashing = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val p = pairSet(portable = true)
    assert(p == Set((1L, 2L, 1.0)))
    // the x64 production twin runs the same algebra over a different hash:
    // identical docs still collide at est 1.0 and the stranger stays out
    assert(pairSet(portable = false) == Set((1L, 2L, 1.0)))
  }
}
