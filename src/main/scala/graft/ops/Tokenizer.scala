package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer training over a corpus (Sennrich 2016 shape — the
 * standard LLM tokenizer-construction pipeline; the reference engine
 * has no tokenizer surface, this is north-star scope).
 *
 * Scale split: the CORPUS-VOLUME stage is the distributed word-
 * frequency count (one map-side-combined shuffle keyed by word); merge
 * learning then runs on the frequency table CAPPED at `maxVocab`
 * distinct words — the same two-phase design production BPE trainers
 * use (word counting scales with the corpus, merge learning with the
 * vocabulary, which is bounded by construction). The driver-side state
 * is maxVocab * avgWordLen symbols, explicitly bounded; it is NOT a
 * hot-path collect of corpus rows.
 */
object Tokenizer {

  /**
   * Weighted adjacent-symbol pair counts at the CHARACTER level — BPE
   * iteration zero, fully relational (this is the per-iteration
   * counting step the trainer repeats after each merge; exposing it
   * oracled pins the arithmetic the loop is built from). A length-2
   * substring IS the adjacent char pair, so pair generation is
   * row-local over the DISTINCT-word relation (vocabulary-sized, tiny
   * next to the corpus — the HOF there costs nothing).
   */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val words = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words.filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
  }

  /**
   * Learn `numMerges` BPE merges: start from character symbols, each
   * round count adjacent symbol pairs weighted by word frequency, take
   * the most frequent pair (ties broken by (left, right) ascending —
   * fully deterministic), fuse it everywhere (left-to-right,
   * non-overlapping — "aaa" under (a,a) becomes [aa, a]), repeat.
   * Output: one row per learned merge (rank, left, right, merged,
   * pair_count). Stops early when no pair remains.
   *
   * The merge loop is driver-side over the top-`maxVocab` frequency
   * table (deterministic (freq desc, word) cut via TakeOrdered) — see
   * the object scaladoc for why that split is the scale-honest one.
   */
  def bpeTrain(df: DataFrame, textCol: String,
               numMerges: Int = 50, maxVocab: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val wf = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (w.split("").filter(_.nonEmpty), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        pc.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + f))
      if (pc.isEmpty) done = true
      else {
        val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, l + r, c))
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /**
   * Apply learned merges to ONE word — the exact re-application loop
   * the trainer runs between rounds (each merge in rank order, fused
   * left-to-right non-overlapping), so encode(train corpus) reproduces
   * the trainer's final segmentation by construction.
   */
  def applyMerges(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.split("").filter(_.nonEmpty)
    for ((l, r) <- merges if syms.length > 1) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
    }
    syms
  }

  /**
   * Column face of the native min-rank encoder
   * ([[graft.expr.BpeEncode]]): array<string> BPE tokens of `word`
   * under the learned merge table. Equivalent to [[applyMerges]]
   * (spec-pinned) but O(firing-merges · len) per word instead of
   * O(tableSize · len) — the production path once tables reach the
   * 1k+ merges a real tokenizer carries. Codegen-native: the rank
   * table rides in as a referenced object, one call per row.
   */
  def bpeEncodeCol(word: org.apache.spark.sql.Column,
                   merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expr.BpeEncode(
        org.apache.spark.sql.graft.ColumnBridge.expression(word), merges))

  /**
   * Corpus-wide BPE segmentation statistics on the VOCABULARY relation:
   * (word, freq, n_tokens, n_chars). The same scale split as training —
   * the corpus-volume stage is the word-frequency count (one map-side-
   * combined shuffle); the iterative merge application (inherently
   * sequential per word, not SQL-expressible — see the q_llm_bpe_merges
   * coverage note) runs only on DISTINCT words, a vocabulary-bounded
   * relation, so the per-row Scala encode is bounded work OFF the
   * corpus-volume path. Merges ride into the closure as a (numMerges)-
   * sized immutable list — broadcast-by-closure, no shuffle.
   */
  def bpeSegmentVocab(df: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val m = merges.toIndexedSeq
    val nTok = udf((w: String) => applyMerges(w, m).length)
    df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("n_tokens", nTok(col("w")).cast("long"))
      .withColumn("n_chars", length(col("w")).cast("long"))
  }

  /**
   * Per-source tokenizer fertility report: words, BPE tokens, chars,
   * fertility (tokens per word) and compression (chars per token) in
   * integer micros. The standard "how well does this tokenizer fit
   * each source" health check when curating a multi-source training
   * mix — a source with outlier fertility is being shredded to
   * near-characters and will dominate the token budget.
   *
   * Scale shape: one corpus-volume (source, word) count shuffle; the
   * encode cost lands on the per-source vocabulary relation; the
   * closing per-source agg is map-side combined. The join of the
   * (source, word) counts with the per-word token counts is keyed on
   * the word — vocabulary-sized on the build side, AQE's broadcast
   * choice.
   */
  def bpeFertility(df: DataFrame, textCol: String, sourceCol: String,
                   merges: Seq[(String, String)],
                   nativeEncode: Boolean = false): DataFrame = {
    val m = merges.toIndexedSeq
    val nTok = udf((w: String) => applyMerges(w, m).length)
    val sw = df.filter(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"), explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
    val tokLen =
      if (nativeEncode) size(bpeEncodeCol(col("w"), m))
      else nTok(col("w"))
    val enc = sw.select(col("w")).distinct()
      .withColumn("n_tok", tokLen.cast("long"))
      .withColumn("n_chr", length(col("w")).cast("long"))
    sw.join(enc, "w")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_tokens"),
        sum(col("cnt") * col("n_chr")).as("n_chars"))
      .withColumn("fertility_micro", expr("n_tokens * 1000000 div n_words"))
      .withColumn("chars_per_token_micro", expr("n_chars * 1000000 div n_tokens"))
  }
}
