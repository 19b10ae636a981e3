package graft.ops

import graft.SparkTestBase

/** Exact-moment statistics: correlation matrix + OLS fit. */
class StatsSpec extends SparkTestBase {

  test("correlationMatrix: perfect line, hand-computed pair, zero variance -> null") {
    import spark.implicits._
    // y = 2x exactly; z constant (zero variance); w hand-computable
    val df = Seq(
      (1.0, 2.0, 5.0, 1.0),
      (2.0, 4.0, 5.0, 3.0),
      (3.0, 6.0, 5.0, 2.0),
      (4.0, 8.0, 5.0, 6.0)
    ).toDF("x", "y", "z", "w")
    val got = Stats.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got.size == 6)
    assert(got(("x", "y"))._1 == 4L)
    assert(math.abs(got(("x", "y"))._2.get - 1.0) < 1e-12)
    // any pair with the constant column is null
    assert(got(("x", "z"))._2.isEmpty && got(("y", "z"))._2.isEmpty && got(("z", "w"))._2.isEmpty)
    // hand formula for (x, w): n=4 sx=10 sw=12 sxx=30 sww=50 sxw=37
    val expected = (4.0 * 37 - 10 * 12) / (math.sqrt(4.0 * 30 - 100) * math.sqrt(4.0 * 50 - 144))
    assert(math.abs(got(("x", "w"))._2.get - expected) < 1e-12)
  }

  test("correlationMatrix: a null in ANY requested column drops the row listwise") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0), Some(1.0)),
      (Some(2.0), None, Some(2.0)), // excluded from every pair, not just (x,y)
      (Some(3.0), Some(6.0), Some(3.0)),
      (Some(4.0), Some(8.0), Some(5.0))
    ).toDF("x", "y", "v")
    val got = Stats.correlationMatrix(df, Seq("x", "y", "v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.values.toSet == Set(3L)) // one shared n for all pairs
  }

  test("olsFit: exact line per group, intercept units, zero x-variance -> null") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 12.0), ("a", 2.0, 14.0), ("a", 3.0, 16.0), // y = 2x + 10
      ("b", 5.0, 1.0), ("b", 5.0, 9.0) // vertical: no fit
    ).toDF("g", "x", "y")
    val got = Stats.olsFit(df, "x", "y", Seq("g")).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val (na, slopeA, interceptA) = got("a")
    assert(na == 3L)
    assert(math.abs(slopeA.get - 2.0) < 1e-9)
    assert(math.abs(interceptA.get - 10.0) < 1e-9)
    assert(got("b")._2.isEmpty && got("b")._3.isEmpty)
  }

  test("benford: integer leading digit incl. sub-1 values, shares, expectation table") {
    import spark.implicits._
    // 0.0234 -> micro 234 -> digit 2; 123.0 -> digit 1; 950 -> 9;
    // 0 and null excluded
    val df = Seq(
      ("g", Some(123.0)), ("g", Some(150.0)), ("g", Some(0.0234)),
      ("g", Some(950.0)), ("g", Some(0.0)), ("g", None)
    ).toDF("grp", "v")
    val got = Stats.benford(df, "v", Seq("grp"))
      .collect().map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Long]("share_micro"),
          r.getAs[Long]("benford_micro"), r.getAs[Long]("dev_micro"))).toMap
    assert(got(1) == ((2L, 500000L, 301030L, 198970L)))
    assert(got(2) == ((1L, 250000L, 176091L, 73909L)))
    assert(got(9) == ((1L, 250000L, 45757L, 204243L)))
    assert(got.size == 3)
    // the expectation table is the quantized closed form
    assert(Stats.benfordMicro(1) == 301030L && Stats.benfordMicro(9) == 45757L)
    assert(Stats.benfordMicro.values.sum == 1000000L) // quantization sums exactly to 1e6
  }

  test("valueHistogram: global edges, top-edge inclusion, constant column, group split") {
    import spark.implicits._
    // values 0..10: span = 10*1e4+1 micros; 4 buckets
    val df = (0 to 10).map(v => (if (v < 5) "a" else "b", v.toDouble)).toDF("g", "v")
    val got = Stats.valueHistogram(df, "v", Seq("g"), nBuckets = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // micro values m = v*10000 in 0..100000; bucket = min(3, m*4 div 100001):
    // v 0-2 -> b0, v 3-5 -> b1, v 6-7 -> b2, v 8-10 -> b3 (top edge
    // lands in the last bucket, not past it)
    assert(got == Map(("a", 0) -> 3L, ("a", 1) -> 2L, ("b", 1) -> 1L,
      ("b", 2) -> 2L, ("b", 3) -> 3L))
    // constant column degenerates to bucket 0 with lo == value
    val const = Seq(("x", 7.0), ("x", 7.0)).toDF("g", "v")
    val c = Stats.valueHistogram(const, "v", Seq("g"), nBuckets = 5).collect()
    assert(c.length == 1 && c.head.getInt(1) == 0 && c.head.getLong(2) == 2L)
    assert(c.head.getAs[Long]("lo_micro") == 70000L)
  }

  test("imputeMean: per-group exact mean fills nulls; empty group keeps null") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", None)
    ).toDF("g", "v")
    val got = Stats.imputeMean(df, "v", Seq("g")).collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    // two originals survive, the null fills with the exact mean 2.0
    assert(got.filter(_._1 == "a").flatMap(_._2).sorted.toSeq == Seq(1.0, 2.0, 3.0))
    assert(got.filter(_._1 == "b").head._2.isEmpty)
  }

  test("winsorize: outlier clamps to the sigma bound, inliers and nulls pass through") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(1.0)),
      ("a", Some(100.0)), ("a", None)
    ).toDF("g", "v")
    val got = Stats.winsorize(df, "v", Seq("g"), sigmas = 1.0).collect()
      .map(r => (Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getAs[Boolean]("was_clipped"), Option(r.getAs[Any]("v_w"))))
    val outlier = got.find(_._1.contains(100.0)).get
    assert(outlier._2)
    val clamped = outlier._3.get.asInstanceOf[Double]
    // mean 20.8, population sd ~39.6 -> bound ~60.4; clamp strictly below 100
    assert(clamped > 20.8 && clamped < 100.0)
    got.filter(_._1.contains(1.0)).foreach { r => assert(!r._2 && r._3.get == 1.0) }
    val nullRow = got.find(_._1.isEmpty).get
    assert(!nullRow._2 && nullRow._3.isEmpty)
  }

  test("refIntegrity: orphans, null keys, integral rate") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profile.refIntegrity("c->p", child, "fk", parent, "pk").collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (("c->p", 4L, 1L, 1L, 333333L)))
  }

  test("abTest: exact integer significance verdict on closed-form cohorts") {
    import spark.implicits._
    def cohort(variant: Int, users: Range, conv: Int) =
      users.map(u => (u.toLong, variant, u - users.head < conv))
    // 50% vs 20% over 100 users each -> clearly significant at z=2
    val strong = (cohort(0, 0 until 100, 50) ++ cohort(1, 100 until 200, 20))
      .toDF("user_id", "variant", "converted")
    val s = Stats.abTest(strong, "user_id", "variant", "converted").collect().head
    assert((s.getAs[Long]("n_a"), s.getAs[Long]("c_a"),
      s.getAs[Long]("n_b"), s.getAs[Long]("c_b")) == ((100L, 50L, 100L, 20L)))
    assert(s.getAs[Long]("rate_a_micro") == 500000L)
    assert(s.getAs[Long]("diff_micro") == 300000L)
    assert(s.getAs[Boolean]("significant"))
    // 50% vs 48% -> inside noise
    val weak = (cohort(0, 0 until 100, 50) ++ cohort(1, 100 until 200, 48))
      .toDF("user_id", "variant", "converted")
    assert(!Stats.abTest(weak, "user_id", "variant", "converted")
      .collect().head.getAs[Boolean]("significant"))
    // a unit with several rows counts once, converted if ever converted
    val multi = Seq((1L, 0, false), (1L, 0, true), (2L, 1, false))
      .toDF("user_id", "variant", "converted")
    val m = Stats.abTest(multi, "user_id", "variant", "converted").collect().head
    assert((m.getAs[Long]("n_a"), m.getAs[Long]("c_a")) == ((1L, 1L)))
  }

  test("auc: perfect separation, tie handling, inversion, degenerate labels") {
    import spark.implicits._
    def a(rows: Seq[(Double, Int)]): Option[Long] =
      Option(Stats.auc(rows.toDF("s", "y"), "s", "y").collect().head.get(2))
        .map(_.asInstanceOf[Long])
    // positives strictly above negatives -> AUC 1
    assert(a(Seq((0.1, 0), (0.2, 1), (0.3, 1))).contains(1000000L))
    // anti-predictive -> 0
    assert(a(Seq((0.9, 0), (0.2, 1), (0.1, 1))).contains(0L))
    // a pos and a neg tied -> 0.5
    assert(a(Seq((0.5, 0), (0.5, 1))).contains(500000L))
    // textbook mixed case: scores 1..4, y = 0,1,0,1 -> U = (2-1)+(4-2)=3? hand:
    // ranks 1,2,3,4; sum ranks of pos = 2+4 = 6; U = 6 - 2*3/2 = 3; PN = 4 -> 0.75
    assert(a(Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1))).contains(750000L))
    // degenerate: all positive -> NULL
    assert(a(Seq((1.0, 1), (2.0, 1))).isEmpty)
    // gini = 2*auc - 1
    val g = Stats.auc(Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)).toDF("s", "y"), "s", "y")
      .collect().head
    assert(g.getAs[Long]("gini_micro") == 500000L)
  }

  test("confusion: exact counts and PRF micros at each threshold") {
    import spark.implicits._
    // scores 1..4 with labels 0,0,1,1; threshold 3 -> tp=2 fp=0 tn=2 fn=0
    val df = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("s", "y")
    val got = Stats.confusion(df, "s", "y", Seq(BigDecimal(3), BigDecimal(4)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long]),
          Option(r.get(7)).map(_.asInstanceOf[Long]))).toMap
    assert(got(30000L) == ((2L, 0L, 2L, 0L, Some(1000000L), Some(1000000L), Some(1000000L))))
    // threshold 4: tp=1 fn=1 -> recall 0.5, precision 1, f1 = 2/3
    assert(got(40000L) == ((1L, 0L, 2L, 1L, Some(1000000L), Some(500000L), Some(666666L))))
  }

  test("reliability: bins report exact mean score and positive rate") {
    import spark.implicits._
    // two clusters: low scores never positive, high scores always
    val df = (Seq.fill(4)((1.0, 0)) ++ Seq.fill(4)((9.0, 1))).toDF("s", "y")
    val got = Stats.reliability(df, "s", "y", nBins = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0) == ((4L, 1000000L, 0L)))
    assert(got(1) == ((4L, 9000000L, 1000000L)))
  }

  test("exactPercentiles: nearest-rank values, duplicates, multiple groups") {
    import spark.implicits._
    // group a: 1..10 -> p50 = 5 (rank 5), p90 = 9, p100 = 10
    // group b: 1,1,1,9 -> p50 = rank 2 -> 1; p90 = rank ceil(3.6)=4 -> 9
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      Seq(("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 9.0))).toDF("g", "v")
    val got = Stats.exactPercentiles(df, "v", Seq("g"),
        psMicro = Seq(500000L, 900000L, 1000000L))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("value")).toMap
    assert(got(("a", 500000L)) == 5.0)
    assert(got(("a", 900000L)) == 9.0)
    assert(got(("a", 1000000L)) == 10.0)
    assert(got(("b", 500000L)) == 1.0)
    assert(got(("b", 900000L)) == 9.0)
    assert(got.size == 6)
  }

  test("multiclassReport: cell counts, per-class recall/precision, accuracy micros") {
    import spark.implicits._
    // truth: a,a,a,b,b,c ; pred: a,a,b,b,b,a
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("id", "label")
    val pred = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "b"), (6L, "a"))
      .toDF("id", "plabel")
    val got = Stats.multiclassReport(pred, "id", "plabel", truth, "id", "label")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getLong(5))).toMap
    // accuracy = 4/6 everywhere
    got.values.foreach { case (_, _, _, acc) => assert(acc == 666666L) }
    // cell (a,a): n=2; recall(a) = 2/3; precision(a) = 2/3 (2 of 3 a-predictions)
    assert(got(("a", "a")) == ((2L, 666666L, Some(666666L), 666666L)))
    // cell (c,a): recall(c) = 0; precision(a) = 2/3
    assert(got(("c", "a")) == ((1L, 0L, Some(666666L), 666666L)))
    // cell (b,b): recall(b) = 2/2 = 1; precision(b) = 2/3
    assert(got(("b", "b")) == ((2L, 1000000L, Some(666666L), 666666L)))
    assert(got.size == 4) // (a,a),(a,b),(b,b),(c,a)
  }

  test("concentration: perfect equality -> 0, extreme concentration -> (n-1)/n") {
    import spark.implicits._
    val equal = (1 to 4).map(i => (i.toLong, 5.0)).toDF("k", "v")
    val e = Stats.concentration(equal, "k", "v").collect().head
    assert(e.getLong(0) == 4L && e.getAs[Long]("gini_micro") == 0L)
    // one key holds everything: G = (n-1)/n = 0.75
    val skew = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 100.0)).toDF("k", "v")
    val s = Stats.concentration(skew, "k", "v").collect().head
    assert(s.getAs[Long]("gini_micro") == 750000L)
    // multiple rows per key sum first
    val multi = Seq((1L, 2.0), (1L, 3.0), (2L, 5.0)).toDF("k", "v")
    val m = Stats.concentration(multi, "k", "v").collect().head
    assert(m.getLong(0) == 2L && m.getAs[Long]("gini_micro") == 0L)
  }

  test("wilson: interval brackets the rate and stays inside [0,1] at the extremes") {
    import spark.implicits._
    val df = (Seq.fill(3)(("hot", 1)) ++ Seq.fill(1)(("hot", 0)) ++
      Seq.fill(5)(("all", 1)) ++ Seq.fill(5)(("none", 0))).toDF("g", "f")
    val got = Stats.wilson(df, "f", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))).toMap
    val (n, c, lo, hi) = got("hot")
    assert((n, c) == ((4L, 3L)))
    assert(lo > 0.0 && hi < 1.0 && lo < 0.75 && hi > 0.75)
    // all successes: upper bound stays <= 1, lower well below 1 at n=5
    val (_, _, loA, hiA) = got("all")
    assert(hiA <= 1.0 && loA < 0.9 && loA > 0.3)
    // all failures: mirror
    val (_, _, loN, hiN) = got("none")
    assert(loN >= 0.0 && hiN > 0.1 && hiN < 0.7)
  }

  test("crosstabChi2: closed-form 2x2 table") {
    import spark.implicits._
    val rows = Seq.fill(3)(("a", 1)) ++ Seq(("a", 2)) ++
      Seq(("b", 1)) ++ Seq.fill(3)(("b", 2))
    val got = Stats.crosstabChi2(rows.toDF("r", "c"), "r", "c")
      .collect().map(x => (x.getString(0), x.getInt(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    // rt = ct = 4, N = 8 -> e = 2 (2e6 micro) everywhere; each cell
    // contributes (o-2)^2/2 = 0.5 -> chi2 total 2.0
    assert(got.size == 4)
    got.values.foreach { case (_, e, contrib, total) =>
      assert(e == 2000000L && contrib == 500000L && total == 2000000L)
    }
    assert(got(("a", 1))._1 == 3L && got(("a", 2))._1 == 1L)
  }
}
