package graft.ops

import graft.SparkTestBase

/** Fellegi-Sunter linkage: weights, missing fields, block valve. */
class LinkageSpec extends SparkTestBase {

  private val mu = Seq(("name", 0.9, 0.1), ("city", 0.8, 0.2))

  test("fellegiSunter: agreement/disagreement/missing weights and the clerical band") {
    import spark.implicits._
    val w = Linkage.weightTable(mu)
    val Seq((_, nameA, nameD), (_, cityA, cityD)) = w
    assert(nameA == math.floor(math.log(9.0) * 1e6 + 0.5).toLong)
    val a = Seq((1L, "b1", "ann", "nyc"), (2L, "b1", "bob", "sf"),
      (3L, "b1", "cat", null.asInstanceOf[String])).toDF("id", "blk", "name", "city")
    val b = Seq((11L, "b1", "ann", "nyc"), (12L, "b1", "ann", "la"))
      .toDF("id", "blk", "name", "city")
    val got = Linkage.fellegiSunter(a, b, "id", "blk", Seq("name", "city"), mu,
        upperMicro = nameA + cityA, lowerMicro = nameD + cityD)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got((1L, 11L)) == ((nameA + cityA, "match"))) // both agree
    assert(got((1L, 12L)) == ((nameA + cityD, "review"))) // name only
    assert(got((2L, 11L)) == ((nameD + cityD, "non_match")))
    assert(got((3L, 11L)) == ((nameD, "review"))) // null city contributes 0
    assert(got.size == 6)
  }

  test("fellegiSunter: overfull blocks drop whole") {
    import spark.implicits._
    val a = (1 to 40).map(i => (i.toLong, "big", "x", "y")) :+ ((99L, "ok", "x", "y"))
    val b = (1 to 40).map(i => (100L + i, "big", "x", "y")) :+ ((199L, "ok", "x", "y"))
    val got = Linkage.fellegiSunter(a.toDF("id", "blk", "name", "city"),
        b.toDF("id", "blk", "name", "city"), "id", "blk",
        Seq("name", "city"), mu, upperMicro = 1L, lowerMicro = -1L,
        maxBlockPairs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((99L, 199L))) // 40*40 > 100 -> 'big' dropped whole
  }
}
