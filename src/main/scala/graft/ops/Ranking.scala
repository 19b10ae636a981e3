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

  /**
   * BM25 retrieval: top-`topK` corpus documents per query — the
   * search-engine face of the same scoring ([[bm25TopTerms]] is the
   * keyword-extraction face). Query-term multiplicity is ignored
   * (DISTINCT query terms — the standard BM25 query model); each
   * (term, doc) partial score quantizes to integer micros BEFORE the
   * per-(query, doc) sum, so pair scores are exact integers in any
   * engine.
   *
   * Scale shape: the corpus side is the same single tf shuffle as
   * [[bm25TopTerms]]; queries join the posting relation on term (the
   * inverted-index probe — query batches are small, AQE broadcasts
   * them). The one unbounded join is a stop term whose posting list
   * is the whole corpus: terms appearing in more than half the
   * documents are dropped (`df · 2 > n_docs`, the integral form of
   * every production engine's stop list — a term that common carries
   * near-zero idf anyway).
   */
  def bm25Retrieve(queries: DataFrame, qidCol: String, qtextCol: String,
                   docs: DataFrame, idCol: String, textCol: String,
                   topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docs.select(col(idCol).as("id"),
      explode(Dedup.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val withDl = tf.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy(col("id"))))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tf.groupBy().agg(
      countDistinct(col("id")).as("n_docs"),
      (sum(col("tf")).cast("double") / countDistinct(col("id"))).as("avgdl"))
    val postings = withDl
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .filter(col("df") * 2 <= col("n_docs")) // stop-term cap, integral
      .withColumn("s_micro", floor(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
          * lit(1000000d) + lit(0.5)).cast("long"))
      .select(col("term"), col("id"), col("s_micro"))
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(Dedup.tokens(col(qtextCol)))).as("term"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("bm25_micro").desc, col("id").asc)
    qterms.join(postings, "term")
      .groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("s_micro")).as("bm25_micro"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("id").as(idCol), col("rank"),
        col("n_matched"), col("bm25_micro"))
  }
}
