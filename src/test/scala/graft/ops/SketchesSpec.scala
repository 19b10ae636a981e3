package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Relational Count-Min sketch + decayed engagement. */
class SketchesSpec extends SparkTestBase {

  test("countMin: estimate >= truth always; sketch is d*w rows max; twins share the property") {
    import spark.implicits._
    val toks = (1 to 400).flatMap { i =>
      val t = s"tok${i % 50}" // 50 distinct keys, 8 occurrences each
      Seq(t)
    } ++ Seq.fill(100)("heavy")
    val df = toks.toDF("tok")
    for (portable <- Seq(true, false)) {
      val est = Sketches.countMinEstimates(df, "tok", d = 3, w = 64,
          portableHashing = portable)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"CM estimate must never undercount ($k portable=$portable)")
      }
      // heavy key: 100 of 500 items over w=64 buckets -> collisions add
      // at most a few buckets' worth; the bound e*N/w holds with room
      assert(est("heavy") <= 100L + (3 * 500) / 64)
      val sketch = Sketches.countMinTable(df, "tok", d = 3, w = 64,
        portableHashing = portable)
      assert(sketch.count() <= 3L * 64)
    }
  }

  test("countMin: sketches merge by union + re-aggregate") {
    import spark.implicits._
    val a = Seq.fill(10)("x").toDF("tok")
    val b = (Seq.fill(5)("x") ++ Seq.fill(7)("y")).toDF("tok")
    val merged = Sketches.countMinTable(a, "tok", d = 2, w = 16, portableHashing = true)
      .unionAll(Sketches.countMinTable(b, "tok", d = 2, w = 16, portableHashing = true))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMinTable(a.unionAll(b), "tok", d = 2, w = 16,
      portableHashing = true)
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet ==
      whole.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("hllPartials/hllRollup: chained unions estimate within tolerance") {
    import spark.implicits._
    // 3 groups x 400 distinct values with 50% overlap between groups:
    // union cardinality is NOT the sum, so a correct rollup must union
    // sketches, not add estimates
    val rows = for (g <- 0 until 3; i <- 0 until 400) yield (g, g * 200 + i)
    val df = rows.toDF("g", "v")
    val partials = Sketches.hllPartials(df, Seq("g"), "v", lgK = 12)
    assert(partials.count() == 3)
    val perGroup = partials
      .select(col("g"), Sketches.hllEstimate(col("hll_sketch")).as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 3).foreach(g => assert(math.abs(perGroup(g) - 400L) <= 20, s"g=$g"))
    // chain: groups -> global (distinct values = 0..799+2*200 = 800)
    val global = Sketches.hllRollup(partials, Nil)
      .select(Sketches.hllEstimate(col("hll_sketch")).as("est"))
      .head().getLong(0)
    val exact = rows.map(_._2).distinct.size
    assert(math.abs(global - exact) <= exact / 20, s"global $global vs $exact")
  }

  test("histogram partials/rollup/quantiles: merge equals direct, read-off is bucket-exact") {
    import spark.implicits._
    // two groups over [0,100) in 10 buckets; known bucket placement
    val rows = (0 until 100).map(v => ("a", v.toDouble)) ++
      (0 until 50).map(v => ("b", v.toDouble * 2))
    val df = rows.toDF("g", "v")
    val parts = Sketches.histogramPartials(df, Seq("g"), "v", 0.0, 100.0, 10)
    // direct global histogram == rolled-up partials, bucket for bucket
    val direct = Sketches.histogramPartials(df, Nil, "v", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rolled = Sketches.histogramRollup(parts, Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled == direct)
    // group a: uniform 0..99 -> p50 in bucket 4 (ceil(0.5*100)=50th value=49),
    // p95 in bucket 9 (95th value = 94)
    val q = Sketches.histogramQuantiles(parts, Seq("g"), Seq(0.5, 0.95), 0.0, 100.0, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(q(("a", 500000L)) == 4L && q(("a", 950000L)) == 9L, q.toString)
    // group b: values 0,2,..,98 -> 50 values; p50 = 25th = 48 -> bucket 4
    assert(q(("b", 500000L)) == 4L)
    // global quantiles from the ROLLED histogram (empty keys: the
    // pmod-partition path) agree with a direct global computation
    val g1 = Sketches.histogramQuantiles(rolled.toSeq.map(kv => (kv._1, kv._2))
      .toDF("bucket", "cnt"), Nil, Seq(0.5), 0.0, 100.0, 10)
      .collect().map(_.getLong(2)).toSeq
    val g2 = Sketches.histogramQuantiles(
      Sketches.histogramPartials(df, Nil, "v", 0.0, 100.0, 10),
      Nil, Seq(0.5), 0.0, 100.0, 10).collect().map(_.getLong(2)).toSeq
    assert(g1 == g2 && g1.nonEmpty)
    // clamping: out-of-domain mass lands in the edge buckets
    val clamped = Sketches.histogramPartials(
      Seq(("x", -5.0), ("x", 500.0)).toDF("g", "v"), Seq("g"), "v", 0.0, 100.0, 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(clamped == Map(0L -> 1L, 9L -> 1L))
  }

  test("kmv: exact regime (distinct < k) reproduces true union/intersection") {
    import spark.implicits._
    // A = 0..99, B = 50..149 -> union 150, intersection 50, J = 1/3
    val rows = (0 until 100).map(v => ("A", v.toLong)) ++
      (50 until 150).map(v => ("B", v.toLong))
    for (portable <- Seq(true, false)) {
      val sk = Sketches.kmvSketch(rows.toDF("g", "v"), "g", "v", k = 256,
        portableHashing = portable)
      val est = Sketches.kmvEstimate(sk, 256)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(est == Map("A" -> 100L, "B" -> 100L), s"portable=$portable")
      val ov = Sketches.kmvOverlap(sk, 256).collect()
      assert(ov.length == 1)
      val r = ov.head
      assert(r.getLong(4) == 150L, "est_union exact")
      assert(r.getLong(3) == 50L, "common_k")
      assert(r.getLong(5) == 50L * 1000000L / 150L, "jaccard micro")
      assert(r.getLong(6) == 49L || r.getLong(6) == 50L, s"est_intersection ${r.getLong(6)}")
    }
  }

  test("kmv: estimation regime within sketch-error bounds on both hash paths") {
    import spark.implicits._
    // A = 0..3999, B = 2000..5999: union 6000, intersection 2000, J=1/3
    val rows = (0 until 4000).map(v => ("A", v.toLong)) ++
      (2000 until 6000).map(v => ("B", v.toLong))
    for (portable <- Seq(true, false)) {
      val k = 256
      val sk = Sketches.kmvSketch(rows.toDF("g", "v"), "g", "v", k, portable)
      assert(sk.groupBy("g").count().collect().forall(_.getLong(1) == k))
      val r = Sketches.kmvOverlap(sk, k).head()
      val (estU, jMicro, estI) = (r.getLong(4), r.getLong(5), r.getLong(6))
      // KMV relative error ~1/sqrt(k) ~ 6%; allow 4 sigma
      assert(math.abs(estU - 6000) <= 1500, s"portable=$portable est_union $estU")
      assert(math.abs(jMicro - 333333) <= 120000, s"portable=$portable J $jMicro")
      assert(math.abs(estI - 2000) <= 800, s"portable=$portable est_inter $estI")
    }
  }

  test("decayedEngagement: step decay on whole half-lives, exact weights") {
    import spark.implicits._
    val day = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // corpus max = day 29. u1: events at 0, 7, 14 days before max ->
    // weights 1e6, 5e5, 2.5e5. u2: one event 28 days back -> 62500.
    val df = Seq(
      (1L, day(29)), (1L, day(22)), (1L, day(15)),
      (2L, day(1))
    ).toDF("user_id", "ts")
    val got = Sessions.decayedEngagement(df, "user_id", "ts", halfLifeDays = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((3L, 1750000L)))
    assert(got(2L) == ((1L, 62500L)))
  }
}
