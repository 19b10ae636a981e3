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
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val spark = SparkSession.active
    require(buckets > 0 && maxIter > 0)

    // (id, b) gram-bucket stream per side — shared featurization with Dsir
    val rawG = Dsir.gramBuckets(raw, idCol, textCol, buckets, portable = false)
    val tgtG = Dsir.gramBuckets(target, idCol, textCol, buckets, portable = false)

    // deterministic hash-mod downsample per class for the fit set; the
    // classifier needs a representative sample, not the corpus (docs at
    // or under the cap -> modulus 1 -> fit on everything)
    def fitCounts(g: DataFrame, label: Double): DataFrame = {
      val estBytes = g.queryExecution.optimizedPlan.stats.sizeInBytes
      val estDocs = (estBytes / BigInt(512L)).toLong.max(1L) // ~bytes per doc row
      val sampled =
        if (estDocs <= maxFitDocs) g
        else g.filter(pmod(xxhash64(col("id")), lit(estDocs / maxFitDocs + 1)) === 0)
      sampled.groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(collect_list(struct(col("b"), col("c"))).as("bc"))
        .select(lit(label).as("label"), col("bc"))
    }
    val toVec = udf { bc: Seq[org.apache.spark.sql.Row] =>
      val sorted = bc.map(r => (r.getLong(0).toInt, r.getLong(1).toDouble))
        .sortBy(_._1)
      Vectors.sparse(buckets, sorted.map(_._1).toArray, sorted.map(_._2).toArray)
    }
    val fit = fitCounts(rawG, 0.0).unionByName(fitCounts(tgtG, 1.0))
      .withColumn("features", toVec(col("bc"))).drop("bc")
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      .fit(fit)

    // SCORE relationally: B-row broadcast coefficient table, one
    // map-side-combined doc aggregate — zero ml code at corpus volume.
    val coef = model.coefficients.toArray
    val coefDf = spark.createDataFrame(
      coef.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq)
      .toDF("b", "w")
    val intercept = model.intercept
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
