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

  /** 1/log2(r+1) in micros for ranks 1..k — the NDCG discount table,
    * quantized ONCE so both engines state identical literals. */
  def discountTable(k: Int): Seq[(Int, Long)] = (1 to k).map(r =>
    r -> math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)

  /**
   * NDCG@k of a ranked result relation against graded relevance truth
   * — search-quality evaluation in EXACT integers: the discount
   * 1/log2(rank+1) is a k-entry literal table (micros, quantized once
   * — no runtime log), DCG = Σ rel·discount over the top-k results
   * (unjudged docs score 0, the standard convention), IDCG re-ranks
   * the truth by (rel desc, doc asc), and ndcg_micro = DCG·10⁶ div
   * IDCG. Queries with no positive truth yield NULL. One (qid, doc)
   * join + two qid-keyed aggregates; the truth side is usually the
   * small one — AQE broadcasts it.
   */
  def ndcg(results: DataFrame, truth: DataFrame, qidCol: String, docCol: String,
           rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    val disc = discountTable(k)
    def discOf(rank: org.apache.spark.sql.Column) =
      disc.foldLeft(when(lit(false), lit(0L))) { case (acc, (r, d)) =>
        acc.when(rank === r, d)
      }.otherwise(lit(0L))
    val res = results.filter(col(rankCol) <= k)
      .select(col(qidCol).as("qid"), col(docCol).as("doc"), col(rankCol).as("rnk"))
    val tru = truth.filter(col(relCol) > 0)
      .select(col(qidCol).as("qid"), col(docCol).as("doc"), col(relCol).as("rel"))
    val dcg = res.join(tru, Seq("qid", "doc"), "left")
      .withColumn("_g", coalesce(col("rel"), lit(0L)) * discOf(col("rnk")))
      .groupBy(col("qid")).agg(sum(col("_g")).as("dcg_micro"))
    val wI = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("doc").asc)
    val idcg = tru.withColumn("_ir", row_number().over(wI))
      .filter(col("_ir") <= k)
      .withColumn("_g", col("rel") * discOf(col("_ir")))
      .groupBy(col("qid")).agg(sum(col("_g")).as("idcg_micro"))
    dcg.join(idcg, Seq("qid"), "full")
      .withColumn("dcg_micro", coalesce(col("dcg_micro"), lit(0L)))
      .withColumn("ndcg_micro",
        when(col("idcg_micro") > 0, expr("dcg_micro * 1000000 div idcg_micro")))
      .select(col("qid"), col("dcg_micro"), col("idcg_micro"), col("ndcg_micro"))
  }
}
