package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Closed-form fixtures for the event-sequence analytics (Markov
  * transitions, integer z-test spike detection), integer PageRank,
  * and co-occurrence lift. */
class EventGraphSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("eventTransitions: counts, integral probabilities, tiebreak order") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (1L, 2L, "b", ts("2024-01-01 10:01:00")),
      (1L, 3L, "a", ts("2024-01-01 10:02:00")),
      (2L, 4L, "a", ts("2024-01-01 11:00:00")),
      (2L, 5L, "b", ts("2024-01-01 11:01:00")),
      // u3: same-ts pair ordered by the event_id tiebreak: a then c
      (3L, 6L, "a", ts("2024-01-01 12:00:00")),
      (3L, 7L, "c", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Funnels.eventTransitions(ev, "user_id", "ts", "event_type",
      tiebreak = Seq("event_id"))
    assertSameRecords(out, Seq(
      Map("prev_type" -> "a", "next_type" -> "b", "n" -> 2L, "p_micro" -> 666666L),
      Map("prev_type" -> "a", "next_type" -> "c", "n" -> 1L, "p_micro" -> 333333L),
      Map("prev_type" -> "b", "next_type" -> "a", "n" -> 1L, "p_micro" -> 1000000L)))
  }

  test("rateAnomalies: exact integer z-test flags the spike day only") {
    import spark.implicits._
    // type x: six days of 10 events + one day of 40 -> only the 40 flags
    // ((7*40-100)^2 = 32400 > 4*(7*2200-100^2) = 21600); a type seen on
    // a single day has zero variance and never flags.
    val rows =
      (for (d <- 1 to 6; _ <- 1 to 10) yield ("x", ts(f"2024-01-0$d%d 01:00:00"))) ++
      (for (_ <- 1 to 40) yield ("x", ts("2024-01-07 01:00:00"))) ++
      Seq(("y", ts("2024-01-01 02:00:00")))
    val out = Funnels.rateAnomalies(rows.toDF("event_type", "ts"), "event_type", "ts", z = 2)
    val flagged = out.filter(col("is_anomaly")).collect()
    assert(flagged.length == 1)
    assert(flagged.head.getAs[String]("event_type") == "x")
    assert(flagged.head.getAs[String]("day") == "2024-01-07")
    assert(flagged.head.getAs[Long]("mean_micro") == 14285714L)
    assert(out.count() == 8)
  }

  test("pageRank: 3-iteration integral ranks on a 3-node path graph") {
    import spark.implicits._
    // duplicate + reversed input edges collapse into one undirected edge
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graphs.pageRank(edges, "a", "b", iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // base = 1e9 div 3; hand-computed chain (see scaladoc arithmetic)
    assert(out(1L) == (1L, 209729163L))
    assert(out(2L) == (2L, 580541661L))
    assert(out(3L) == (1L, 209729163L))
  }

  test("sessionPaths: gap splits, step truncation, deterministic top-k rank") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (1L, 2L, "b", ts("2024-01-01 10:10:00")),
      (1L, 3L, "c", ts("2024-01-01 12:00:00")), // > 1h gap: new session
      (2L, 4L, "a", ts("2024-01-01 09:00:00")),
      (2L, 5L, "b", ts("2024-01-01 09:05:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessions.sessionPaths(ev, "user_id", "ts", "event_type",
      gapSeconds = 3600, maxSteps = 5, topK = 10, tiebreak = Seq("event_id"))
    assertSameRecords(out, Seq(
      Map("path" -> "a>b", "n_sessions" -> 2L, "rank" -> 1L),
      Map("path" -> "c", "n_sessions" -> 1L, "rank" -> 2L)))
    val truncated = Sessions.sessionPaths(ev, "user_id", "ts", "event_type",
      gapSeconds = 3600, maxSteps = 1, topK = 10, tiebreak = Seq("event_id"))
    assertSameRecords(truncated, Seq(
      Map("path" -> "a", "n_sessions" -> 2L, "rank" -> 1L),
      Map("path" -> "c", "n_sessions" -> 1L, "rank" -> 2L)))
  }

  test("bounceReport: per-entry-type session counts and bounce basis points") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (1L, 2L, "b", ts("2024-01-01 10:10:00")), // session 1: entry a, 2 events
      (1L, 3L, "c", ts("2024-01-01 12:00:00")), // session 2: entry c, bounce
      (2L, 4L, "b", ts("2024-01-01 09:00:00"))  // entry b, bounce
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Sessions.bounceReport(ev, "user_id", "ts", "event_type",
      gapSeconds = 3600, tiebreak = Seq("event_id"))
    assertSameRecords(out, Seq(
      Map("entry_type" -> "a", "n_sessions" -> 1L, "n_bounces" -> 0L, "bounce_bp" -> 0L),
      Map("entry_type" -> "b", "n_sessions" -> 1L, "n_bounces" -> 1L, "bounce_bp" -> 10000L),
      Map("entry_type" -> "c", "n_sessions" -> 1L, "n_bounces" -> 1L, "bounce_bp" -> 10000L)))
  }

  test("skewReport: log2 count-of-counts buckets with row mass") {
    import spark.implicits._
    val rows = (Seq.fill(1)("k1") ++ Seq.fill(2)("k2") ++ Seq.fill(3)("k3") ++
      Seq.fill(8)("k4")).toDF("k")
    val out = Skew.skewReport(rows, "k").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(1 -> (1L, 1L, 1L, 1L), 2 -> (2L, 5L, 2L, 3L),
      4 -> (1L, 8L, 8L, 8L)))
  }

  test("triangleCounts: two triangles sharing a node; dup/reversed edges collapse") {
    import spark.implicits._
    // bowtie: {1,2,3} and {3,4,5} share node 3; (5,6) closes nothing;
    // (2,1) duplicates (1,2) reversed and must not double-count
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 3L), (5L, 6L), (2L, 1L)).toDF("a", "b")
    val out = Graphs.triangleCounts(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("cooccurrenceLift: windows stay within docs; lift arithmetic exact") {
    import spark.implicits._
    // "a b a b": d1 pairs ab,ba,ab; d2 pairs aa,bb; "c" adds a token
    // (T=5) but no pairs. minCount=2 keeps only (a,b): lift_bp =
    // 2*25*10000 div (5*2*2) = 25000.
    val docs = Seq("a b a b", "c").toDF("text")
    val out = TextAnalysis.cooccurrenceLift(docs, "text", maxDist = 2, minCount = 2)
    assertSameRecords(out, Seq(
      Map("w_a" -> "a", "w_b" -> "b", "n_ab" -> 2L, "n_a" -> 2L, "n_b" -> 2L,
        "lift_bp" -> 25000L)))
    // minCount=1 exposes the distance-2 self pairs
    val all = TextAnalysis.cooccurrenceLift(docs, "text", maxDist = 2, minCount = 1)
    assert(all.count() == 4)
    val aa = all.filter(col("w_a") === "a" && col("w_b") === "a").head()
    assert(aa.getAs[Long]("lift_bp") == 12500L)
  }

  test("labelPropagation: two disjoint triangles settle on min labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val out = Graphs.labelPropagation(edges, "a", "b", iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
    // one round from id-labels: every node adopts its min neighbor id
    val one = Graphs.labelPropagation(edges, "a", "b", iters = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 5L, 5L -> 4L, 6L -> 4L))
  }

  test("linkPrediction: path graph wedges, square cn=2, adjacent pairs excluded") {
    import spark.implicits._
    // path 1-2-3-4: candidates (1,3) and (2,4), each cn=1
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val gotPath = Graphs.linkPrediction(path, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // (1,3): deg1=1 deg3=2 cn=1 -> 1e6 // 2; (2,4): deg2=2 deg4=1 -> same
    assert(gotPath == Map((1L, 3L) -> ((1L, 500000L)), (2L, 4L) -> ((1L, 500000L))))
    // square 1-2-3-4-1: diagonals share BOTH neighbors (jaccard 1.0);
    // every adjacent pair is excluded even though adjacent pairs share
    // no neighbors here
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val gotSq = Graphs.linkPrediction(square, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotSq == Map((1L, 3L) -> ((2L, 1000000L)), (2L, 4L) -> ((2L, 1000000L))))
  }

  test("rollingBands: spike flags against the trailing window; level shift stops alerting") {
    import spark.implicits._
    // 10 steady days of 2, one day of 20, then 10 steady days of 20:
    // the spike day flags; after k=7 days at the new level the window
    // population is all 20s and the alert clears
    val days = (1 to 21).map(d => (d, if (d < 11) 2 else 20))
    val ev = days.flatMap { case (d, n) =>
      (1 to n).map(i => ("click", ts(f"2024-01-$d%02d ${10 + i % 3}%02d:00:00")))
    }.toDF("event_type", "ts")
    val got = Funnels.rollingBands(ev, "event_type", "ts", k = 7, z = 2)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(5))).toMap
    assert(got("2024-01-11") == ((20L, true))) // the jump day
    assert(got("2024-01-10") == ((2L, false)))
    assert(got("2024-01-21") == ((20L, false))) // window fully at the new level
  }

  test("seasonalAnomalies: a spike is judged against its own weekday-hour slot") {
    import spark.implicits._
    // Mondays at 10:00 over 9 weeks: eight 2s then a 20 -> the spike
    // clears the z=2 integer test ((9*20-36)^2 = 20736 > 4*(9*432-36^2)
    // = 10368). Monday 11:00 steady 20s -> zero variance, NOT
    // anomalous even though 20 equals the spiking count.
    val mondays = (0 to 8).map(k =>
      java.time.LocalDate.parse("2024-01-01").plusDays(7L * k).toString)
    val ev = mondays.zipWithIndex.flatMap { case (d, i) =>
      val at10 = if (i == 8) 20 else 2
      (1 to at10).map(k => ("click", ts(s"$d 10:0${k % 6}:00"))) ++
        (1 to 20).map(k => ("click", ts(s"$d 11:0${k % 6}:00")))
    }.toDF("event_type", "ts")
    val got = Funnels.seasonalAnomalies(ev, "event_type", "ts", z = 2)
      .collect().map(r => (r.getString(1), r.getInt(3)) ->
        (r.getLong(4), r.getBoolean(6))).toMap
    assert(got(("2024-02-26", 10)) == ((20L, true)))
    assert(got(("2024-01-01", 10)) == ((2L, false)))
    mondays.foreach(d => assert(got((d, 11)) == ((20L, false))))
  }

  test("eventNgrams: per-key ordering, tiebreak determinism, topK rank") {
    import spark.implicits._
    val ev = Seq(
      // u1: a b c a b c -> trigrams a>b>c, b>c>a, c>a>b, a>b>c
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:01:00"), "b", 2L),
      (1L, ts("2024-01-01 10:02:00"), "c", 3L),
      (1L, ts("2024-01-01 10:03:00"), "a", 4L),
      (1L, ts("2024-01-01 10:04:00"), "b", 5L),
      (1L, ts("2024-01-01 10:05:00"), "c", 6L),
      // u2: same-ts pair ordered by the event_id tiebreak: a (7) then b (8)
      (2L, ts("2024-01-01 11:00:00"), "x", 9L),
      (2L, ts("2024-01-01 11:01:00"), "a", 7L),
      (2L, ts("2024-01-01 11:01:00"), "b", 8L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Sessions.eventNgrams(ev, "user_id", "ts", "event_type", "event_id",
        n = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // u2 wait: x at 11:00 comes first, then a,b at 11:01 -> x>a>b
    assert(got.toSeq == Seq(("a>b>c", 2L, 1), ("b>c>a", 1L, 2)))
  }

  test("linkPrediction: hub mid-nodes above maxDegree generate no wedges; reversed/dup edges collapse") {
    import spark.implicits._
    // star: center 9 with 4 leaves (deg 4 > maxDegree 3) -> no candidate pairs
    val star = Seq((9L, 1L), (2L, 9L), (9L, 3L), (9L, 4L), (1L, 9L)).toDF("a", "b")
    assert(Graphs.linkPrediction(star, "a", "b", maxDegree = 3).count() == 0)
    // with the bound relaxed the leaves pair up through the center
    assert(Graphs.linkPrediction(star, "a", "b", maxDegree = 4).count() == 6)
  }
}
