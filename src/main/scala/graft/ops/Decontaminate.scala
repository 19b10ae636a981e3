package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — the training-data staple of flagging
 * corpus documents that share word n-grams with an evaluation set, so
 * test data never leaks into training data.
 *
 * Shape at 100 TB: both sides reduce to DISTINCT hashed grams
 * ([[Dedup.wordGramHashes]] — 8-byte keys, never raw strings) before
 * the only shuffle, an inner join on the gram key. The benchmark side
 * is an eval SET — typically millions of grams, far under broadcast
 * thresholds — so the join usually broadcasts and the corpus never
 * re-partitions; when it doesn't, AQE picks the shuffle join. Output
 * keeps every corpus row (left join) with its contaminated-gram count.
 */
object Decontaminate {

  /**
   * @param minOverlap distinct shared n-grams at or above which a doc
   *   is flagged `contaminated` (1 = any overlap).
   */
  def flags(corpus: DataFrame, benchmark: DataFrame,
            idCol: String, textCol: String,
            n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val corpusGrams = corpus.select(col(idCol).as("id"),
        explode(Dedup.wordGramHashes(col(textCol), n)).as("g"))
    val benchGrams = benchmark
      .select(explode(Dedup.wordGramHashes(col(textCol), n)).as("g"))
      .distinct()
    // grams are distinct per doc already, so count(*) = distinct overlap
    val counts = corpusGrams.join(benchGrams, "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("contaminated_grams"))
    corpus.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("contaminated_grams"), lit(0L)).as("contaminated_grams"),
        (coalesce(col("contaminated_grams"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /**
   * Per-doc contamination SCORE — the audit face of [[flags]]: how
   * MUCH of each document overlaps the benchmark (distinct-gram count,
   * overlapping-gram count, and the overlap fraction in integer micros
   * via INTEGRAL division — exact in any engine). Train/test-overlap
   * audits bucket on this fraction, where the binary flag only gates.
   * Same one-shuffle hashed-gram join shape as [[flags]]; the per-doc
   * gram count is row-local (no extra pass).
   */
  def score(corpus0: DataFrame, benchmark: DataFrame,
            idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // a null doc has no grams: size(null) would ride to a NULL n_grams
    // and ratio — a silent cross-engine divergence (SQL oracles emit
    // NULL where Spark legacy modes emit -1). Exclude null text
    // outright; mirror the filter in any oracle over null-bearing data.
    val corpus = corpus0.filter(col(textCol).isNotNull)
    val grams = Dedup.wordGramHashes(col(textCol), n)
    val corpusGrams = corpus.select(col(idCol).as("id"), explode(grams).as("g"))
    val benchGrams = benchmark.select(explode(grams).as("g")).distinct()
    val hits = corpusGrams.join(benchGrams, "g")
      .groupBy(col("id")).agg(count(lit(1)).as("hit_grams"))
    corpus.select(col(idCol).as("id"), size(grams).cast("long").as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("hit_grams"), lit(0L)).as("hit_grams"))
      .withColumn("contamination_micro", expr("hit_grams * 1000000 div n_grams"))
  }
}
