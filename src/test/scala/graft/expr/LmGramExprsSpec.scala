package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the native LM gram/unit extractions to the Column-algebra
  * formulations they replaced (r16): identical rows on edge fixtures —
  * empty text, single token, two tokens, unicode, repeated tokens. */
class LmGramExprsSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtures = Seq(
    (1L, ""),                       // tokens() of "" -> [""]
    (2L, "one"),
    (3L, "two tokens"),
    (4L, "three tokens here"),
    (5L, "a b c d e"),
    (6L, "dup dup dup dup"),
    (7L, "Ünïcode Tökens ünïcode"),
    (8L, "x y x y x"))

  private def toked = fixtures.toDF("id", "text")
    .select(col("id"), graft.ops.Dedup.tokens(col("text")).as("_toks"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("tagged_grams == zip_with/slice formulation, both orders") {
    graft.functions.Registry.ensure(spark)
    for (withTri <- Seq(0, 1)) {
      val native = toked.select(col("id"),
          explode(call_function("tagged_grams", col("_toks"), lit(withTri))).as("_g"))
        .select(col("id"), col("_g.kind"), col("_g.a"), col("_g.b"), col("_g.c"))
      val n = size(col("_toks"))
      val len3 = greatest(n - 2, lit(0))
      val len2 = greatest(n - 1, lit(0))
      val nullStr = lit(null).cast("string")
      val triArr = zip_with(
        zip_with(
          slice(col("_toks"), lit(1), len3),
          slice(col("_toks"), lit(2), len3),
          (a, b) => struct(a.as("a"), b.as("b"))),
        slice(col("_toks"), lit(3), len3),
        (ab, c) => struct(lit("t").as("kind"), ab.getField("a").as("a"),
          ab.getField("b").as("b"), c.as("c")))
      val bigArr = zip_with(
        slice(col("_toks"), lit(1), len2),
        slice(col("_toks"), lit(2), len2),
        (a, b) => struct(lit("b").as("kind"), a.as("a"), b.as("b"), nullStr.as("c")))
      val uniArr = transform(col("_toks"),
        t => struct(lit("u").as("kind"), t.as("a"), nullStr.as("b"), nullStr.as("c")))
      val all = if (withTri == 1) concat(triArr, bigArr, uniArr)
                else concat(bigArr, uniArr)
      val ref = toked.select(col("id"), explode(all).as("_g"))
        .select(col("id"), col("_g.kind"), col("_g.a"), col("_g.b"), col("_g.c"))
      // multiset equality: counts per row value
      val nat = native.groupBy(native.columns.map(col): _*).count()
      val rf = ref.groupBy(ref.columns.map(col): _*).count()
      assert(rows(nat) == rows(rf), s"tagged_grams withTri=$withTri diverges")
    }
  }

  test("mkn_units withHeads=1 == heads+triples; withHeads=0 == triples alone") {
    graft.functions.Registry.ensure(spark)
    val n = size(col("_toks"))
    val len3 = greatest(n - 2, lit(0))
    val nullStr = lit(null).cast("string")
    val triArr = zip_with(
      zip_with(
        slice(col("_toks"), lit(1), len3),
        slice(col("_toks"), lit(2), len3),
        (a, b) => struct(a.as("u"), b.as("v"))),
      slice(col("_toks"), lit(3), len3),
      (uv, c) => struct(uv.getField("u").as("u"), uv.getField("v").as("v"), c.as("w")))
    val head1 = struct(nullStr.as("u"), nullStr.as("v"),
      element_at(col("_toks"), 1).as("w"))
    val units = when(n >= 2,
      concat(array(head1, struct(nullStr.as("u"),
        element_at(col("_toks"), 1).as("v"),
        element_at(col("_toks"), 2).as("w"))), triArr))
      .otherwise(array(head1))
    def agg(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id"), col("_t.u").as("u"), col("_t.v").as("v"), col("_t.w").as("w"))
      .groupBy(col("id"), col("u"), col("v"), col("w")).agg(count(lit(1)).as("_tf"))
    val natH = agg(toked.select(col("id"),
      explode(call_function("mkn_units", col("_toks"), lit(1))).as("_t")))
    val refH = agg(toked.select(col("id"), explode(units).as("_t")))
    assert(rows(natH) == rows(refH), "mkn_units withHeads=1 diverges")
    val natT = agg(toked.select(col("id"),
      explode(call_function("mkn_units", col("_toks"), lit(0))).as("_t")))
    val refT = agg(toked.filter(n >= 3).select(col("id"), explode(triArr).as("_t")))
    assert(rows(natT) == rows(refT), "mkn_units withHeads=0 diverges")
  }

  test("kn_units == head+pairs formulation") {
    graft.functions.Registry.ensure(spark)
    val nullStr = lit(null).cast("string")
    val ref = toked.select(col("id"), explode(concat(
        array(struct(nullStr.as("prev"), element_at(col("_toks"), 1).as("cur"))),
        zip_with(
          slice(col("_toks"), lit(1), size(col("_toks")) - 1),
          slice(col("_toks"), lit(2), size(col("_toks")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur"))))).as("_t"))
      .select(col("id"), col("_t.prev"), col("_t.cur"))
    val native = toked.select(col("id"),
        explode(call_function("kn_units", col("_toks"))).as("_t"))
      .select(col("id"), col("_t.prev"), col("_t.cur"))
    def cnt(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(d.columns.map(col): _*).count()
    assert(rows(cnt(native)) == rows(cnt(ref)), "kn_units diverges")
  }
}
