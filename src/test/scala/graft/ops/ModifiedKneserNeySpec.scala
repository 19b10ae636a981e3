package graft.ops

import graft.SparkTestBase
import scala.collection.mutable

/** [[TextAnalysis.modifiedKneserNeyLogProb]] — pinned two independent
  * ways: (1) value-identical to a from-scratch driver-side reference
  * implementation (Maps and loops, no Spark) on corpora that exercise
  * every discount bucket, the count-of-counts fallbacks, the
  * mid-level zero-continuation case, and the den2-null full backoff;
  * (2) the normalization property that distinguishes modified KN from
  * Stupid Backoff: Σ_w P(w|u,v) over the vocabulary is EXACTLY 1 at
  * every level (discount clamping preserves it because D(c) ≤ c in
  * every bucket). */
class ModifiedKneserNeySpec extends SparkTestBase {
  import spark.implicits._

  // ---------- driver-side reference implementation ----------

  private case class RefModel(
      vocab: Seq[String],
      tri: Map[(String, String, String), Long],
      ctx3: Map[(String, String), (Long, Long, Long, Long)], // ca3, a1, a2, a3
      cont2: Map[(String, String), Long],
      den2: Map[String, (Long, Long, Long, Long)],           // den2, m1, m2, m3
      cont1: Map[String, Long],
      b: Long, v: Long,
      d31: Double, d32: Double, d33: Double,
      e1: Double, e2: Double, e3: Double) {
    def pCont(w: String): Double =
      (cont1.getOrElse(w, 0L) + 1).toDouble / (b + v).toDouble
    def pMid(vv: String, w: String): Double = den2.get(vv) match {
      case None => pCont(w)
      case Some((dn, m1, m2, m3)) =>
        val c = cont2.getOrElse((vv, w), 0L)
        val e = if (c == 1) e1 else if (c == 2) e2 else if (c >= 3) e3 else 0.0
        math.max(c.toDouble - e, 0.0) / dn.toDouble +
          ((e1 * m1 + e2 * m2 + e3 * m3) / dn.toDouble) * pCont(w)
    }
    def pTri(u: String, vv: String, w: String): Double = ctx3.get((u, vv)) match {
      case None => pMid(vv, w) // unseen context: full backoff (SRILM)
      case Some((ca3, a1, a2, a3)) =>
        val c = tri.getOrElse((u, vv, w), 0L)
        val d = if (c == 1) d31 else if (c == 2) d32 else if (c >= 3) d33 else 0.0
        math.max(c.toDouble - d, 0.0) / ca3.toDouble +
          ((d31 * a1 + d32 * a2 + d33 * a3) / ca3.toDouble) * pMid(vv, w)
    }
  }

  private def fit(docs: Seq[(Long, String)]): RefModel = {
    val toks = docs.map { case (_, t) => t.trim.toLowerCase.split("\\s+").toSeq }
    val tri = mutable.Map.empty[(String, String, String), Long].withDefaultValue(0L)
    val big = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (ts <- toks) {
      for (i <- 2 until ts.length) tri((ts(i - 2), ts(i - 1), ts(i))) += 1
      for (i <- 1 until ts.length) big((ts(i - 1), ts(i))) += 1
    }
    val ctx3 = tri.groupBy(kv => (kv._1._1, kv._1._2)).map { case ((u, vv), g) =>
      (u, vv) -> ((g.values.sum, g.values.count(_ == 1).toLong,
        g.values.count(_ == 2).toLong, g.values.count(_ >= 3).toLong))
    }
    val cont2 = tri.keys.groupBy(k => (k._2, k._3))
      .map { case (k, g) => k -> g.size.toLong }
    val den2 = cont2.groupBy(_._1._1).map { case (vv, g) =>
      vv -> ((g.values.sum, g.values.count(_ == 1).toLong,
        g.values.count(_ == 2).toLong, g.values.count(_ >= 3).toLong))
    }
    val cont1 = big.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    def nk(cs: Iterable[Long], k: Long) = cs.count(_ == k).toLong
    def dset(cs: Iterable[Long]): (Double, Double, Double) = {
      val (n1, n2, n3, n4) = (nk(cs, 1), nk(cs, 2), nk(cs, 3), nk(cs, 4))
      val y = if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2).toDouble else 0.0
      // unusable estimate (empty bucket OR nonpositive value) falls
      // back to KenLM's --discount_fallback constants
      def dk(k: Int, nk0: Long, nk1: Long, fb: Double) = {
        val f = k.toDouble - (k + 1.0) * y * nk1.toDouble / nk0.toDouble
        if (nk0 > 0 && f > 0) f else fb
      }
      (dk(1, n1, n2, 0.5), dk(2, n2, n3, 1.0), dk(3, n3, n4, 1.5))
    }
    val (d31, d32, d33) = dset(tri.values)
    val (e1, e2, e3) = dset(cont2.values)
    RefModel(toks.flatten.distinct, tri.toMap, ctx3, cont2, den2, cont1,
      big.size.toLong, toks.flatten.distinct.size.toLong, d31, d32, d33, e1, e2, e3)
  }

  private def nllMicro(p: Double): Long =
    math.floor(-math.log(p) * 1e6 + 0.5).toLong

  private def refScore(docs: Seq[(Long, String)],
                       train: Seq[(Long, String)] = null): Map[Long, (Long, Long, Long)] = {
    val m = fit(Option(train).getOrElse(docs))
    docs.map { case (id, t) =>
      val ts = t.trim.toLowerCase.split("\\s+").toSeq
      val units = mutable.ArrayBuffer.empty[Long]
      units += nllMicro(m.pCont(ts.head))
      if (ts.length >= 2) units += nllMicro(m.pMid(ts(0), ts(1)))
      for (i <- 2 until ts.length) units += nllMicro(m.pTri(ts(i - 2), ts(i - 1), ts(i)))
      val s = units.sum
      id -> ((units.size.toLong, s, s / units.size))
    }.toMap
  }

  private def opScore(docs: Seq[(Long, String)],
                      train: Seq[(Long, String)] = null): Map[Long, (Long, Long, Long)] = {
    val out = TextAnalysis.modifiedKneserNeyLogProb(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      train = Option(train).map(_.toDF("doc_id", "text")).orNull)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    CachedRelations.releaseAll()
    out
  }

  // exercises: counts 1/3/4/5 (t2=0 → D2 fallback 1.0; Y=1 → D1=1.0),
  // a 2-token doc with den2-null v (x never mid-trigram), a 1-token
  // doc (pCont floor), a 2-token doc whose v IS mid-trigram but whose
  // (v,w) has zero continuation count (pos-2 pure-backoff branch)
  private val corpus1 = Seq(
    (1L, "a b c a b c a b c a b c"),
    (2L, "a b c d e"),
    (3L, "x y"),
    (4L, "z"),
    (5L, "q q r r q r"),
    (6L, "b a"))

  // exercises the D2 real path (a count-2 trigram exists)
  private val corpus2 = Seq(
    (1L, "m n o m n o p"),
    (2L, "n o m"),
    (3L, "o p q o p q n"))

  test("op == independent reference on the bucket-stress corpus") {
    assert(opScore(corpus1) == refScore(corpus1))
  }

  test("op == independent reference with real D2 discounts") {
    assert(opScore(corpus2) == refScore(corpus2))
  }

  test("reference-trained: op == reference across every unseen rung") {
    // model on corpus2; score a corpus with (a) fully-seen trigrams,
    // (b) an unseen trigram under a SEEN context (m n q: ctx3(m,n)
    // exists, triple doesn't), (c) an unseen context over seen words
    // (p m o), (d) entirely OOV words, (e) a 1-token and a 2-token doc
    val scored = Seq(
      (11L, "m n o m"),
      (12L, "m n q"),
      (13L, "p m o"),
      (14L, "zz yy xx ww"),
      (15L, "o"),
      (16L, "q o"))
    assert(opScore(scored, corpus2) == refScore(scored, corpus2))
  }

  test("discount arithmetic: fallbacks and clamps on corpus1") {
    val m = fit(corpus1)
    // trigram counts: abc=5, bca=3, cab=3, bcd=1, cde=1, qqr=1, qrr=1,
    // rrq=1, rqr=1 → t1=6 t2=0 t3=2 t4=0: Y=1, D1=1−0=1, D2 falls back
    // to 1.0 (no count-2 types), D3=3−4·1·0/2=3 (the c=3 types discount
    // to exactly zero and γ carries their mass)
    assert(m.d31 == 1.0 && m.d32 == 1.0 && m.d33 == 3.0)
  }

  test("normalization: Σ_w P(w|·) = 1 at every level (the anti-Stupid-Backoff property)") {
    for (corpus <- Seq(corpus1, corpus2)) {
      val m = fit(corpus)
      val sCont = m.vocab.map(m.pCont).sum
      assert(math.abs(sCont - 1.0) < 1e-9, s"pCont sums to $sCont")
      for (vv <- m.den2.keys) {
        val s = m.vocab.map(w => m.pMid(vv, w)).sum
        assert(math.abs(s - 1.0) < 1e-9, s"pMid($vv,·) sums to $s")
      }
      for ((u, vv) <- m.ctx3.keys) {
        val s = m.vocab.map { w =>
          if (m.tri.contains((u, vv, w))) m.pTri(u, vv, w)
          else {
            // unseen w under an observed context: discounted term is 0
            val (ca3, a1, a2, a3) = m.ctx3((u, vv))
            ((m.d31 * a1 + m.d32 * a2 + m.d33 * a3) / ca3.toDouble) * m.pMid(vv, w)
          }
        }.sum
        assert(math.abs(s - 1.0) < 1e-9, s"pTri($u,$vv,·) sums to $s")
      }
    }
  }

  test("every non-null doc appears; n_tokens is the token count") {
    val out = opScore(corpus1)
    assert(out.keySet == corpus1.map(_._1).toSet)
    assert(out(4L)._1 == 1L && out(3L)._1 == 2L && out(1L)._1 == 12L)
  }

  test("perplexityPartition model=mkn3 bands every doc (no NULL for short docs)") {
    val df = corpus1.toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val pp = TextAnalysis.perplexityPartition(df, "doc_id", "text", "source",
      model = "mkn3")
    val bands = pp.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("ppl_band")).toMap
    CachedRelations.releaseAll()
    assert(bands.size == corpus1.size && bands.values.forall(_ != null))
    intercept[IllegalArgumentException] {
      TextAnalysis.perplexityPartition(df, "doc_id", "text", "source",
        model = "nope")
    }
  }
}
