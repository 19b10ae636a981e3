package graft.ops

import graft.SparkTestBase

/** PCA projection and compression-ratio signal. */
class PcaSpec extends SparkTestBase {

  test("pcaProject: recovers the dominant direction, orthogonal pc2, repartition-stable") {
    import spark.implicits._
    // dominant direction e0 with spread +-1..n, small structured
    // deviation along e1, nothing anywhere else
    val d = 8
    val vecs = (1 to 40).map { i =>
      val t = if (i % 2 == 0) i / 2.0 else -i / 2.0
      val arr = Array.fill(d)(0.0f)
      arr(0) = t.toFloat
      arr(1) = (math.sin(i.toDouble) * 0.3).toFloat
      (i.toLong, arr.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pcaProject(df, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // pc1 must recover t (up to centering): correlation with the
    // planted coordinate is essentially 1
    val ts = vecs.map { case (id, a) => id -> a.head.toDouble }.toMap
    val xs = got.keys.toSeq.sorted
    val p = xs.map(got(_)._1); val t = xs.map(ts)
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size; val ma = a.sum / n; val mb = b.sum / n
      val num = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      num / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum * b.map(y => (y - mb) * (y - mb)).sum)
    }
    assert(math.abs(corr(p, t)) > 0.999)
    // pc2 captures the e1 deviation, decorrelated from pc1
    val p2 = xs.map(got(_)._2)
    assert(math.abs(corr(p, p2)) < 0.05)
    // deterministic under repartitioning (hash sample + literal fit)
    val again = Similarity.pcaProject(df.repartition(5), "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(again == got)
  }

  test("compressionRatio: templated text compresses far below random keys; empty/null disposition") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = Seq(
      (1L, "all work and no play " * 200),
      (2L, Seq.fill(4000)(rnd.nextPrintableChar()).mkString),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // null text dropped, empty kept
    assert(got(1L)._2.get < 50000L) // boilerplate: <5% of raw
    assert(got(2L)._2.get > 700000L) // random printable: >70%
    assert(got(3L) == ((0L, None)))
    // deterministic rerun
    val again = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(again.view.mapValues(_.map(_.asInstanceOf[Long])).toMap ==
      got.view.mapValues(_._2).toMap)
  }
}
