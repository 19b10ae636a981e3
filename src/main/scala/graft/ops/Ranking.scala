package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-statistical term ranking (BM25) — keyword extraction for
 * retrieval indexing and data-curation heuristics over the corpus.
 *
 * Scale shape: the term-frequency table is the only large relation;
 * document frequency (one row per vocabulary term) and the corpus
 * stats (one row) are tiny and broadcast into it, so after the single
 * tf groupBy shuffle every scoring step is map-side. The final top-k
 * runs as a rank window per doc id (WindowGroupLimit keeps k rows per
 * doc on the map side before the exchange). Word-level vocabularies
 * stay broadcastable far past 100 TB (vocab grows ~log of corpus);
 * if the unit were raw n-grams instead, the df join would flip to a
 * shuffle join — Spark/AQE picks that automatically from stats.
 *
 * Scores are emitted in integer micro-units (floor(score*1e6 + 0.5))
 * because the idf's natural log is not bit-reproducible across
 * engines (libm vs JVM may differ in the last ulp); every other step
 * is IEEE-deterministic given identical parenthesization.
 */
object Ranking {

  /** Top-`topK` BM25-scored terms per document. */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String,
                   topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docs.select(col(idCol).as("id"),
      explode(Dedup.tokens(col(textCol))).as("term"))
    // tf feeds the scores, the doc-frequency table and the corpus
    // stats on different shuffle keys — recomputed per consumer ON
    // PURPOSE: persisting this corpus-volume stage measured ~50%
    // slower at sf0.1 than the linear scan+combine recompute (see
    // unigramLogProb for the same finding).
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    // doc length and corpus stats derive from the tf table: no second
    // pass over the corpus text
    val withDl = tf.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy(col("id"))))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tf.groupBy().agg(
      countDistinct(col("id")).as("n_docs"),
      (sum(col("tf")).cast("double") / countDistinct(col("id"))).as("avgdl"))
    // dfreq gets NO broadcast hint: a word-level vocabulary broadcasts
    // fine (and AQE picks that from stats), but a forced hint would
    // OVERRIDE AQE when the term unit is raw n-grams — vocabulary then
    // grows with the corpus and the hint becomes a driver OOM at
    // 100 TB. stats is one row; its hint is always safe.
    val scored = withDl
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl"))))))
      .withColumn("bm25_micro",
        floor(col("score") * lit(1000000d) + lit(0.5)).cast("long"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("bm25_micro").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("term"), col("rank"), col("bm25_micro"))
  }
}
