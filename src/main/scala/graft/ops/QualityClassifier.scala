package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * fastText-style linear quality classifier (the CCNet / LLaMA-pipeline
 * "looks like the curated corpus" filter): hashed bag-of-ngram features,
 * distributed logistic regression fit on target-vs-raw labels, and a
 * RELATIONAL scoring pass over the full corpus. The discriminative
 * complement to [[Dsir]]'s generative importance weights.
 *
 * Scale split (the ivfFit pattern — fit on a bounded sample, apply
 * relationally to everything):
 *  - TRAIN: per-doc sparse count vectors for a deterministic hash-mod
 *    sample of each class (≤ maxFitDocs per side) feed
 *    ml.LogisticRegression (L-BFGS, distributed treeAggregate). The
 *    driver holds only the B-dim coefficient vector.
 *  - SCORE: coefficients become a B-row broadcast table; every raw
 *    doc's logit is Σ count(b)·coef(b) + intercept computed as a
 *    map-side-combined aggregate over the gram stream — the exact
 *    DSIR plan shape, no ml evaluation (and no UDF) anywhere near
 *    corpus volume.
 *
 * Model weights are engine-local (like the IVF k-means cells), so
 * queries over this operator are rows-only; the feature relation it
 * shares with DSIR carries the oracle signal.
 */
object QualityClassifier {

  /** Fit on raw-vs-target, score `scoreOn` (default: the raw corpus
    * itself) with P(target | text). Output: (id, n_grams, logit,
    * p_target). Note on small corpora train==score lets the fit
    * memorize individual raw docs toward 0 — held-out scoring via
    * `scoreOn` is the honest evaluation shape. */
  def trainScore(raw: DataFrame, target: DataFrame,
                 idCol: String, textCol: String,
                 buckets: Int = 4096, maxFitDocs: Long = 100000,
                 maxIter: Int = 20, regParam: Double = 1e-4,
                 scoreOn: Option[DataFrame] = None): DataFrame = {
    val spark = SparkSession.active
    require(buckets > 0 && maxIter > 0)

    // (id, b) gram-bucket stream per side — shared featurization with Dsir
    val rawG = Dsir.gramBuckets(raw, idCol, textCol, buckets, portable = false)
    val tgtG = Dsir.gramBuckets(target, idCol, textCol, buckets, portable = false)

    // deterministic hash-mod downsample per class for the fit set; the
    // classifier needs a representative sample, not the corpus (docs at
    // or under the cap -> modulus 1 -> fit on everything). The fit set
    // is COLLECTED (r16), so like ivfFit's sample the cap is clamped to
    // what the driver comfortably holds.
    val fitCap = math.min(maxFitDocs, 25000L)
    def fitCounts(g: DataFrame, label: Double): DataFrame = {
      val estBytes = g.queryExecution.optimizedPlan.stats.sizeInBytes
      val estDocs = (estBytes / BigInt(512L)).toLong.max(1L) // ~bytes per doc row
      val sampled =
        if (estDocs <= fitCap) g
        else g.filter(pmod(xxhash64(col("id")), lit(estDocs / fitCap + 1)) === 0)
      sampled.groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(collect_list(struct(col("b"), col("c"))).as("bc"))
        .select(lit(label).as("label"), col("bc"))
    }
    // r16: the L-BFGS fit runs ON THE DRIVER over the collected bounded
    // sample (the ivfFit discipline) with the SAME breeze optimizer
    // MLlib wraps (LBFGS(maxIter, m=10, tol=1e-6)) over the standard
    // mean-log-loss + (regParam/2)·||w||² objective (intercept
    // unpenalized, standardization off — the previous configuration).
    // The distributed fit paid one cluster-wide treeAggregate job PER
    // OBJECTIVE EVALUATION (~25-60 jobs) to sum gradients over a
    // sample-bounded set whose arithmetic is sub-second on one core;
    // at 100 TB the fit set is capped either way and the corpus-volume
    // work — featurize + score — stays fully relational.
    val fitRows = fitCounts(rawG, 0.0).unionByName(fitCounts(tgtG, 1.0)).collect()
    require(fitRows.nonEmpty, "quality classifier needs at least one fit doc")
    val n = fitRows.length
    val ys = new Array[Double](n)
    val xsIdx = new Array[Array[Int]](n)
    val xsVal = new Array[Array[Double]](n)
    var ri = 0
    while (ri < n) {
      val row = fitRows(ri)
      ys(ri) = row.getDouble(0)
      val bc = row.getSeq[org.apache.spark.sql.Row](1)
      xsIdx(ri) = bc.map(_.getLong(0).toInt).toArray
      xsVal(ri) = bc.map(_.getLong(1).toDouble).toArray
      ri += 1
    }
    val dim = buckets + 1 // [w(0..buckets-1); intercept]
    def log1pExp(x: Double): Double =
      if (x > 0) x + math.log1p(math.exp(-x)) else math.log1p(math.exp(x))
    val cost = new breeze.optimize.DiffFunction[breeze.linalg.DenseVector[Double]] {
      def calculate(wb: breeze.linalg.DenseVector[Double]) = {
        val grad = breeze.linalg.DenseVector.zeros[Double](dim)
        var loss = 0.0
        var i = 0
        while (i < n) {
          val idx = xsIdx(i); val vs = xsVal(i)
          var m = wb(dim - 1)
          var j = 0
          while (j < idx.length) { m += vs(j) * wb(idx(j)); j += 1 }
          val y = ys(i)
          loss += log1pExp(m) - y * m // -log P(y|x), stable
          val mult = 1.0 / (1.0 + math.exp(-m)) - y
          j = 0
          while (j < idx.length) { grad(idx(j)) += mult * vs(j); j += 1 }
          grad(dim - 1) += mult
          i += 1
        }
        loss /= n
        grad :*= 1.0 / n
        var r = 0.0
        var k = 0
        while (k < dim - 1) {
          r += wb(k) * wb(k); grad(k) += regParam * wb(k); k += 1
        }
        (loss + 0.5 * regParam * r, grad)
      }
    }
    val wb = new breeze.optimize.LBFGS[breeze.linalg.DenseVector[Double]](
      maxIter = maxIter, m = 10, tolerance = 1e-6)
      .minimize(cost, breeze.linalg.DenseVector.zeros[Double](dim))

    // SCORE relationally: B-row broadcast coefficient table, one
    // map-side-combined doc aggregate — zero ml code at corpus volume.
    val coef = wb.toArray.take(buckets)
    val coefDf = spark.createDataFrame(
      coef.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq)
      .toDF("b", "w")
    val intercept = wb(dim - 1)
    val scoreG = scoreOn.fold(rawG)(d =>
      Dsir.gramBuckets(d, idCol, textCol, buckets, portable = false))
    scoreG.join(broadcast(coefDf), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("dot"))
      .select(col("id"), col("n_grams"),
        (col("dot") + lit(intercept)).as("logit"),
        (lit(1.0) / (lit(1.0) + exp(-(col("dot") + lit(intercept))))).as("p_target"))
  }
}
