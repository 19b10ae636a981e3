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
    val wf = wordFreqsCapped(df, textCol, maxVocab)
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
        words = words.map { case (syms, f) => (fuse(syms, l, r, l + r), f) }
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
    for ((l, r) <- merges if syms.length > 1) syms = fuse(syms, l, r, l + r)
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

  // ------------------------------------------------------------------
  // Unigram-LM tokenizer (Kudo 2018, the SentencePiece default family)
  // ------------------------------------------------------------------

  /**
   * Train a unigram-LM tokenizer (Kudo 2018 "Subword Regularization",
   * the SentencePiece default; the reference engine has no tokenizer
   * surface — north-star scope, same family as [[bpeTrain]]).
   *
   * Same scale split as BPE: the CORPUS-VOLUME stage is the
   * map-side-combined word-frequency shuffle, capped deterministically
   * at `maxVocab` distinct words; seeding + EM then run driver-side on
   * that bounded table (state = seedSize pieces + maxVocab words —
   * vocabulary-scale, never corpus-scale).
   *
   * Algorithm (simplified but faithful EM core):
   *  1. Seed: every substring of length 1..maxPieceLen of every word,
   *     occurrence-counted weighted by word frequency; keep ALL single
   *     characters (coverage guarantee) + the top `seedSize` longer
   *     substrings by (count desc, piece asc) — deterministic.
   *  2. `emIters` rounds of exact forward-backward EM over each word's
   *     segmentation lattice: expected piece counts from posteriors,
   *     M-step renormalizes. Corpus log-likelihood is non-decreasing
   *     (spec-pinned).
   *  3. One final prune to `vocabSize`: all single chars survive, the
   *     rest ranked by trained logprob (desc, piece asc); renormalize.
   *     (SentencePiece prunes by likelihood-loss every round; the
   *     single final frequency-rank prune keeps the trainer exact-EM
   *     and fully deterministic — the standard simplification.)
   *
   * Output: one row per piece (rank, piece, n_chars, logprob_micro) —
   * logprob quantized to integer micros so downstream fixtures hash
   * stably.
   */
  def unigramTrain(df: DataFrame, textCol: String,
                   vocabSize: Int = 300, maxPieceLen: Int = 8,
                   seedSize: Int = 3000, emIters: Int = 4,
                   maxVocab: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val vocab = unigramTrainLocalFrom(df, textCol, vocabSize, maxPieceLen,
      seedSize, emIters, maxVocab)
    import spark.implicits._
    vocab.toSeq.sortBy { case (p, lp) => (-lp, p) }.zipWithIndex
      .map { case ((p, lp), i) =>
        (i + 1, p, p.length.toLong, math.round(lp * 1e6)) }
      .toDF("rank", "piece", "n_chars", "logprob_micro")
  }

  /** Distributed word count → trained unigram vocab as the in-memory
    * map [[unigramFertility]] / [[unigramEncode]] consume (piece →
    * normalized logprob). Same deterministic `maxVocab`-bounded
    * collect as [[unigramTrain]] — the only corpus-volume stage. */
  def unigramTrainLocalFrom(df: DataFrame, textCol: String,
      vocabSize: Int = 300, maxPieceLen: Int = 8, seedSize: Int = 3000,
      emIters: Int = 4, maxVocab: Int = 100000): Map[String, Double] = {
    val wf = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    unigramTrainLocal(wf, vocabSize, maxPieceLen, seedSize, emIters)
  }

  /** The driver-side EM core, exposed for spec-level property pinning
    * (likelihood monotonicity, planted-piece recovery, determinism). */
  private[ops] def unigramTrainLocal(wf: Array[(String, Long)],
      vocabSize: Int, maxPieceLen: Int, seedSize: Int,
      emIters: Int): Map[String, Double] =
    unigramTrainLocalTraced(wf, vocabSize, maxPieceLen, seedSize, emIters)._1

  /** Same, returning the per-round marginal corpus log-likelihood
    * trace (the E-step LL of the model entering each round — the
    * quantity EM guarantees non-decreasing). */
  private[ops] def unigramTrainLocalTraced(wf: Array[(String, Long)],
      vocabSize: Int, maxPieceLen: Int, seedSize: Int,
      emIters: Int): (Map[String, Double], Seq[Double]) = {
    val NegInf = Double.NegativeInfinity
    def logAdd(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))

    // 1. seed counts (occurrence-weighted)
    val counts = scala.collection.mutable.HashMap.empty[String, Double]
    for ((w, f) <- wf; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val p = w.substring(i, i + l)
      counts(p) = counts.getOrElse(p, 0.0) + f.toDouble
    }
    val chars = counts.keysIterator.filter(_.length == 1).toVector.sorted
    val multi = counts.iterator.filter(_._1.length >= 2).toVector
      .sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1)
    var pieces: Vector[String] = chars ++ multi
    val totalSeed = pieces.iterator.map(counts).sum
    var logp: Map[String, Double] =
      pieces.iterator.map(p => p -> math.log(counts(p) / totalSeed)).toMap

    // 2. EM
    def emRound(cur: Map[String, Double]): (Map[String, Double], Double) = {
      val exp = scala.collection.mutable.HashMap.empty[String, Double]
      var ll = 0.0
      for ((w, f) <- wf) {
        val n = w.length
        val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
        var i = 1
        while (i <= n) {
          var l = 1
          val lm = math.min(maxPieceLen, i)
          while (l <= lm) {
            val lp = cur.getOrElse(w.substring(i - l, i), NegInf)
            if (lp != NegInf && alpha(i - l) != NegInf)
              alpha(i) = logAdd(alpha(i), alpha(i - l) + lp)
            l += 1
          }
          i += 1
        }
        val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
        var j = n - 1
        while (j >= 0) {
          var l = 1
          val lm = math.min(maxPieceLen, n - j)
          while (l <= lm) {
            val lp = cur.getOrElse(w.substring(j, j + l), NegInf)
            if (lp != NegInf && beta(j + l) != NegInf)
              beta(j) = logAdd(beta(j), beta(j + l) + lp)
            l += 1
          }
          j -= 1
        }
        val z = alpha(n)
        if (z != NegInf) {
          ll += f * z
          var a = 0
          while (a < n) {
            var l = 1
            val lm = math.min(maxPieceLen, n - a)
            while (l <= lm) {
              val p = w.substring(a, a + l)
              val lp = cur.getOrElse(p, NegInf)
              if (lp != NegInf && alpha(a) != NegInf && beta(a + l) != NegInf) {
                val post = math.exp(alpha(a) + lp + beta(a + l) - z)
                if (post > 0) exp(p) = exp.getOrElse(p, 0.0) + f * post
              }
              l += 1
            }
            a += 1
          }
        }
      }
      val tot = exp.values.sum
      // single characters are floored at a vanishing expected count so
      // the coverage guarantee survives EM (a char fully explained by
      // longer pieces would otherwise drop to -inf and break encoding
      // of unseen words)
      val next = pieces.iterator.map { p =>
        val c = exp.getOrElse(p, 0.0)
        val c2 = if (p.length == 1) math.max(c, 1e-12) else c
        p -> (if (c2 > 0) math.log(c2 / tot) else NegInf)
      }.filter(_._2 != NegInf).toMap
      (next, ll)
    }
    val llTrace = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to emIters) {
      val (next, ll) = emRound(logp)
      logp = next
      pieces = pieces.filter(logp.contains)
      llTrace += ll
    }

    // 3. prune to vocabSize: chars always survive
    val keptChars = pieces.filter(_.length == 1)
    val keptMulti = pieces.filter(_.length >= 2)
      .sortBy(p => (-logp(p), p))
      .take(math.max(0, vocabSize - keptChars.size))
    val kept = (keptChars ++ keptMulti).toVector
    val z = kept.iterator.map(logp).reduceOption(logAdd).getOrElse(0.0)
    (kept.iterator.map(p => p -> (logp(p) - z)).toMap, llTrace.toSeq)
  }

  /**
   * Viterbi segmentation of ONE word under a unigram vocab: the
   * max-logprob path through the piece lattice (ties resolve to the
   * shortest final piece — fixed iteration order, fully
   * deterministic). Characters absent from the vocab pass through as
   * single-char pieces (SentencePiece's UNK-char fallback), so the
   * concatenation of the output ALWAYS reconstructs the word.
   */
  def unigramEncode(word: String, vocab: Map[String, Double],
                    maxPieceLen: Int = 8): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val NegInf = Double.NegativeInfinity
    // unknown single chars get a score below every real piece but
    // above -inf, so a path always exists
    val unkPenalty = -1e6
    def score(p: String): Double =
      vocab.getOrElse(p, if (p.length == 1) unkPenalty else NegInf)
    val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
    val back = Array.fill(n + 1)(0)
    var i = 1
    while (i <= n) {
      var l = 1
      val lm = math.min(maxPieceLen, i)
      while (l <= lm) {
        val s = score(word.substring(i - l, i))
        if (s != NegInf && best(i - l) != NegInf && best(i - l) + s > best(i)) {
          best(i) = best(i - l) + s; back(i) = l
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += word.substring(pos - back(pos), pos); pos -= back(pos) }
    out.reverseIterator.toArray
  }

  /**
   * Per-source unigram fertility report — the [[bpeFertility]] twin
   * for the unigram family, same columns, same scale shape (one
   * corpus-volume (source, word) shuffle; Viterbi runs only on the
   * distinct-word relation; the vocab rides in by closure).
   */
  def unigramFertility(df: DataFrame, textCol: String, sourceCol: String,
                       vocab: Map[String, Double],
                       maxPieceLen: Int = 8): DataFrame = {
    val v = vocab
    val nTok = udf((w: String) => unigramEncode(w, v, maxPieceLen).length)
    // cache the vocabulary-scale (source, word) counts: the distinct-
    // word encode side and the join-back both derive from it, so the
    // uncached plan scans the corpus twice (released via
    // CachedRelations after the caller's action)
    val sw = CachedRelations.track(
      df.filter(col(textCol).isNotNull)
        .select(col(sourceCol).as("source"), explode(Dedup.tokens(col(textCol))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
        .persist())
    val enc = sw.select(col("w")).distinct()
      .withColumn("n_tok", nTok(col("w")).cast("long"))
      .withColumn("n_chr", length(col("w")).cast("long"))
    sw.join(enc, "w")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_tokens"),
        sum(col("cnt") * col("n_chr")).as("n_chars"))
      .withColumn("fertility_micro", expr("n_tokens * 1000000 div n_words"))
      .withColumn("chars_per_token_micro", expr("n_chars * 1000000 div n_tokens"))
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
    // cache the vocabulary-scale (source, word) counts: the distinct-
    // word encode side and the join-back both derive from it, so the
    // uncached plan scans the corpus twice (released via
    // CachedRelations after the caller's action)
    val sw = CachedRelations.track(
      df.filter(col(textCol).isNotNull)
        .select(col(sourceCol).as("source"), explode(Dedup.tokens(col(textCol))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
        .persist())
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

  // ------------------------------------------------------------------
  // WordPiece tokenizer (Schuster & Nakajima 2012 — the BERT family)
  // ------------------------------------------------------------------

  /** Split one word into WordPiece seed symbols: the first character
    * bare, every later character with the `##` continuation prefix —
    * the marking that lets greedy inference distinguish word-initial
    * from word-internal pieces. */
  private[ops] def wordpieceSymbols(word: String): Array[String] = {
    val cs = word.split("").filter(_.nonEmpty)
    cs.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }
  }

  /**
   * WordPiece trainer iteration zero, fully relational and exactly
   * oracle-able: for every adjacent seed-symbol pair, its corpus-
   * weighted adjacency count `n` together with the standalone corpus
   * frequencies of both symbols — the three integers the WordPiece
   * score n / (left_freq * right_freq) is a pure function of
   * (Schuster & Nakajima 2012 §III: merge the pair with the greatest
   * unigram-LM likelihood gain, which reduces to that ratio). Emitting
   * the raw integers instead of the quotient keeps the relation
   * hash-exact in any engine — no floating division anywhere.
   *
   * Scale shape: identical to [[bpePairCounts]] — one map-side-
   * combined word-frequency shuffle is the only corpus-volume stage;
   * symbol/pair expansion is a row-local HOF over the distinct-word
   * relation and the two frequency joins are vocabulary-sized (AQE
   * broadcasts them).
   */
  def wordpiecePairScores(df: DataFrame, textCol: String): DataFrame = {
    // persist the vocabulary-sized word-frequency table: the pair
    // relation and BOTH symbol-frequency join sides derive from it, so
    // without the cache the plan scans the corpus three times (the
    // broadcast sides differ only in alias, which defeats exchange
    // reuse). One corpus scan, then vocab-scale work only.
    val words = CachedRelations.track(
      df.filter(col(textCol).isNotNull)
        .select(explode(Dedup.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .persist())
    // sequence(1, n) DESCENDS when n < 1 (Spark semantics) — guard the
    // empty-token row out before building index sequences
    val symFreq = words.filter(length(col("w")) >= 1)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, length(w)),
          |  i -> CASE WHEN i = 1 THEN substring(w, 1, 1)
          |            ELSE concat('##', substring(w, i, 1)) END)""".stripMargin)).as("s"))
      .groupBy(col("s")).agg(sum(col("freq")).as("f"))
    val pairs = words.filter(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, length(w) - 1),
          |  i -> struct(
          |    CASE WHEN i = 1 THEN substring(w, 1, 1)
          |         ELSE concat('##', substring(w, i, 1)) END AS l,
          |    concat('##', substring(w, i + 1, 1)) AS r))""".stripMargin)).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("n"))
    pairs
      .join(symFreq.select(col("s").as("left_sym"), col("f").as("left_freq")), "left_sym")
      .join(symFreq.select(col("s").as("right_sym"), col("f").as("right_freq")), "right_sym")
      .select(col("left_sym"), col("right_sym"), col("n"),
        col("left_freq"), col("right_freq"))
  }

  /**
   * Learn `numMerges` WordPiece merges: start from `##`-marked
   * character symbols, each round fuse the adjacent pair maximizing
   * score(a, b) = count(ab) / (count(a) * count(b)) — the likelihood
   * gain of the fusion under a unigram LM (Schuster & Nakajima 2012;
   * this scoring is what distinguishes WordPiece from BPE's raw
   * count). The comparison is done on exact integers (cross-
   * multiplied in BigInt, so no overflow and no FP ties); score ties
   * break by (left, right) ascending — fully deterministic. Merging
   * (a, ##b) yields a##b with the continuation prefix of `a` kept and
   * `##b`'s stripped, so every learned symbol is itself a well-formed
   * WordPiece vocabulary entry.
   *
   * Output: one row per merge (rank, left, right, merged, pair_count,
   * left_freq, right_freq). Same scale split as [[bpeTrain]]: the
   * corpus-volume stage is the word-frequency shuffle, capped
   * deterministically at `maxVocab`; the merge loop is driver-side on
   * that bounded table.
   */
  def wordpieceTrain(df: DataFrame, textCol: String,
                     numMerges: Int = 50, maxVocab: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val wf = wordFreqsCapped(df, textCol, maxVocab)
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (wordpieceSymbols(w), f) }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long, Long, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val sc = scala.collection.mutable.HashMap.empty[String, Long]
      for ((syms, f) <- words) {
        for (s <- syms) sc.updateWith(s)(v => Some(v.getOrElse(0L) + f))
        for (i <- 0 until syms.length - 1)
          pc.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + f))
      }
      if (pc.isEmpty) done = true
      else {
        // maximize n/(fa*fb): candidate beats incumbent iff
        // n1*fa2*fb2 > n2*fa1*fb1 (all positive) — exact in BigInt
        var bestPair: (String, String) = null
        var bestN = 0L; var bestD = BigInt(0)
        for (((a, b), n) <- pc) {
          val d = BigInt(sc(a)) * BigInt(sc(b))
          val better =
            if (bestPair == null) true
            else {
              val cmp = (BigInt(n) * bestD).compare(BigInt(bestN) * d)
              cmp > 0 || (cmp == 0 &&
                Ordering[(String, String)].lt((a, b), bestPair))
            }
          if (better) { bestPair = (a, b); bestN = n; bestD = d }
        }
        val (l, r) = bestPair
        val merged = l + r.stripPrefix("##")
        merges += ((rank, l, r, merged, bestN, sc(l), sc(r)))
        words = words.map { case (syms, f) => (fuse(syms, l, r, merged), f) }
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq
      .toDF("rank", "left", "right", "merged", "pair_count", "left_freq", "right_freq")
  }

  /** The deterministic (freq desc, word asc) top-`maxVocab` word-
    * frequency cut both char-level trainers start from. */
  private def wordFreqsCapped(df: DataFrame, textCol: String,
                              maxVocab: Int): Array[(String, Long)] =
    df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /**
   * Train a WordPiece model and return the full matching vocabulary
   * [[wordpieceEncode]] consumes: every learned merged symbol PLUS
   * both forms (`c`, `##c`) of every character in the corpus — the
   * character seed is collected from the FULL distinct-word relation
   * (alphabet-bounded distributed distinct, NOT the `maxVocab` cut),
   * so greedy matching can always fall back to single characters and
   * no training-corpus word ever degrades to `[UNK]`.
   */
  def wordpieceVocabFrom(df: DataFrame, textCol: String,
                         numMerges: Int = 50,
                         maxVocab: Int = 100000): Set[String] = {
    val mergedSyms = wordpieceTrain(df, textCol, numMerges, maxVocab)
      .select(col("merged")).collect().map(_.getString(0))
    val chars = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0))
    (chars.toSet ++ chars.map("##" + _) ++ mergedSyms)
  }

  /**
   * WordPiece greedy longest-match-first inference (the BERT
   * tokenizer's algorithm, distinct from training order): from each
   * position take the LONGEST vocabulary entry that matches (with the
   * `##` prefix when not word-initial); if no entry matches at some
   * position the whole word becomes `unk` — the all-or-nothing UNK
   * rule of the published algorithm.
   */
  def wordpieceEncode(word: String, vocab: Set[String],
                      unk: String = "[UNK]"): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < n) {
      var end = n
      var hit: String = null
      while (hit == null && end > start) {
        val sub0 = word.substring(start, end)
        val sub = if (start > 0) "##" + sub0 else sub0
        if (vocab.contains(sub)) hit = sub else end -= 1
      }
      if (hit == null) return Array(unk)
      out += hit
      start = end
    }
    out.toArray
  }

  // ------------------------------------------------------------------
  // Byte-level BPE (Radford et al. 2019, "Language Models are
  // Unsupervised Multitask Learners" §2.2 — the GPT-2 family)
  // ------------------------------------------------------------------

  private val hexChars = "0123456789ABCDEF".toCharArray

  /** Split one word into byte-level BPE seed symbols: its UTF-8 bytes,
    * each as a 2-char uppercase hex symbol ("hi" → ["68","69"]). Hex
    * is the engine-portable byte spelling (Spark `hex(encode(…))` and
    * DuckDB `hex(encode(…))` agree character-for-character), which is
    * what makes the iteration-zero pair relation exactly oracle-able;
    * [[bbpePrintable]] renders the GPT-2 display form. The alphabet is
    * the 256 bytes — EVERY string is coverable, so byte-level BPE
    * never emits UNK (the property that distinguishes it from
    * WordPiece's all-or-nothing `[UNK]` and unigram's char fallback). */
  private[ops] def bbpeSymbols(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i) = new String(Array(hexChars(b >> 4), hexChars(b & 0xF)))
      i += 1
    }
    out
  }

  /** Inverse of [[bbpeEncode]]: concatenate the hex tokens, decode the
    * bytes as UTF-8. Merges only ever CONCATENATE adjacent byte
    * symbols, so decode(encode(w)) == w for every w and every merge
    * table — the lossless-by-construction contract (property-pinned in
    * ByteBpeSpec on arbitrary Unicode including mojibake fixtures). */
  def bbpeDecode(tokens: Seq[String]): String = {
    val hex = tokens.mkString
    val bytes = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The GPT-2 byte→printable-unicode table (the public
    * `bytes_to_unicode` construction): visibly printable bytes
    * ('!'..'~', '¡'..'¬', '®'..'ÿ') map to themselves; the other 68
    * (controls, space, DEL, 0xAD…) map to 256+k in first-free order —
    * a bijection, so tokenizer vocabularies serialize as readable
    * text. Display-layer only; training and encoding stay on hex. */
  val byteToUnicode: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar
      else { val c = (256 + n).toChar; n += 1; c }
    }.toArray
  }

  /** Render one hex token ("68656C" …) in the GPT-2 printable form. */
  def bbpePrintable(token: String): String = {
    val sb = new StringBuilder(token.length / 2)
    var i = 0
    while (i + 1 < token.length) {
      sb += byteToUnicode(Integer.parseInt(token.substring(i, i + 2), 16))
      i += 2
    }
    sb.toString
  }

  /**
   * Byte-level BPE trainer iteration zero, fully relational and
   * exactly oracle-able: corpus-weighted adjacent BYTE-pair counts
   * over the distinct-word relation, each pair spelled as 4 uppercase
   * hex chars (a 4-char slice of `hex(encode(word))` at odd offsets IS
   * the adjacent byte pair — DuckDB restates it verbatim). Same scale
   * shape as [[bpePairCounts]]: one map-side-combined word-frequency
   * shuffle is the only corpus-volume stage; the hex expansion is a
   * row-local HOF on the vocabulary relation.
   */
  def bbpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val words = df.filter(col(textCol).isNotNull)
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // sequence(1, n) DESCENDS when n < 1 (Spark semantics) — words
    // under two bytes are guarded out before the index sequence
    words.select(col("freq"), expr("hex(encode(w, 'UTF-8'))").as("h"))
      .filter(length(col("h")) >= 4)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(h) div 2 - 1), i -> substring(h, 2*i - 1, 4))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
  }

  /**
   * Learn `numMerges` byte-level BPE merges: start from the UTF-8 byte
   * symbols of each word (hex-spelled), each round fuse the most
   * frequent adjacent pair (ties by (left, right) hex ascending —
   * fully deterministic, and hex order IS byte order), exactly
   * [[bpeTrain]]'s loop one alphabet down. Multi-byte UTF-8 sequences
   * fuse back together from raw bytes purely by frequency — the GPT-2
   * property that the trainer needs no notion of characters at all.
   * Output: (rank, left, right, merged, pair_count); same two-phase
   * scale split as [[bpeTrain]] (corpus-volume word-frequency shuffle,
   * driver merge loop on the `maxVocab`-bounded table).
   */
  def bbpeTrain(df: DataFrame, textCol: String,
                numMerges: Int = 50, maxVocab: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val wf = wordFreqsCapped(df, textCol, maxVocab)
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (bbpeSymbols(w), f) }
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
        words = words.map { case (syms, f) => (fuse(syms, l, r, l + r), f) }
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** One left-to-right non-overlapping fusion pass — the shared inner
    * step of every BPE-family trainer and encoder in this object. */
  private def fuse(syms: Array[String], l: String, r: String,
                   merged: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Apply learned byte-level merges to ONE word — [[applyMerges]]
    * starting from UTF-8 byte symbols instead of characters. Never
    * emits UNK: unmatched bytes pass through as single-byte symbols
    * and [[bbpeDecode]] reconstructs the word exactly. */
  def bbpeEncode(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = bbpeSymbols(word)
    for ((l, r) <- merges if syms.length > 1) syms = fuse(syms, l, r, l + r)
    syms
  }

  /** Column face of the native min-rank encoder at BYTE level — the
    * [[bpeEncodeCol]] twin for the GPT-2 family (same
    * [[graft.expr.BpeEncode]] expression seeded from the word's UTF-8
    * bytes as hex pairs): O(firing-merges · len) per word vs
    * [[bbpeEncode]]'s O(tableSize · len) rescan, equivalence
    * spec-pinned in ByteBpeSpec. */
  def bbpeEncodeCol(word: org.apache.spark.sql.Column,
                    merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expr.BpeEncode(
        org.apache.spark.sql.graft.ColumnBridge.expression(word), merges,
        byteLevel = true))

  /**
   * Per-source byte-level-BPE fertility report — the [[bpeFertility]]
   * twin for the GPT-2 family (same columns, same one-shuffle scale
   * shape) plus `n_bytes`: byte-level fertility is tokens per word
   * over the UTF-8 BYTE stream, so bytes-per-token is the compression
   * number this tokenizer family is actually judged on.
   */
  def bbpeFertility(df: DataFrame, textCol: String, sourceCol: String,
                    merges: Seq[(String, String)],
                    nativeEncode: Boolean = false): DataFrame = {
    val m = merges.toIndexedSeq
    val nTok = udf((w: String) => bbpeEncode(w, m).length)
    val sw = CachedRelations.track(
      df.filter(col(textCol).isNotNull)
        .select(col(sourceCol).as("source"), explode(Dedup.tokens(col(textCol))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
        .persist())
    val tokLen =
      if (nativeEncode) size(bbpeEncodeCol(col("w"), m))
      else nTok(col("w"))
    val enc = sw.select(col("w")).distinct()
      .withColumn("n_tok", tokLen.cast("long"))
      .withColumn("n_byt", expr("length(encode(w, 'UTF-8'))").cast("long"))
    sw.join(enc, "w")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_tokens"),
        sum(col("cnt") * col("n_byt")).as("n_bytes"))
      .withColumn("fertility_micro", expr("n_tokens * 1000000 div n_words"))
      .withColumn("bytes_per_token_micro", expr("n_bytes * 1000000 div n_tokens"))
  }

  /**
   * Per-source WordPiece fertility report — the [[bpeFertility]] /
   * [[unigramFertility]] twin for the WordPiece family: same columns,
   * same scale shape (one corpus-volume (source, word) shuffle; greedy
   * encoding runs only on the distinct-word relation; the vocab set
   * rides in by closure), plus `unk_words` — the corpus-weighted count
   * of words that degraded to `[UNK]` (zero on the training corpus by
   * the character-seed guarantee, nonzero the moment the model meets
   * out-of-alphabet text — the health number a curation run watches).
   */
  def wordpieceFertility(df: DataFrame, textCol: String, sourceCol: String,
                         vocab: Set[String]): DataFrame = {
    val v = vocab
    val enc = udf((w: String) => wordpieceEncode(w, v).toSeq)
    // cache the vocabulary-scale (source, word) counts: the distinct-
    // word encode side and the join-back both derive from it, so the
    // uncached plan scans the corpus twice (released via
    // CachedRelations after the caller's action)
    val sw = CachedRelations.track(
      df.filter(col(textCol).isNotNull)
        .select(col(sourceCol).as("source"), explode(Dedup.tokens(col(textCol))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
        .persist())
    val encoded = sw.select(col("w")).distinct()
      .withColumn("toks", enc(col("w")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("is_unk",
        when(col("toks") === array(lit("[UNK]")), 1L).otherwise(0L))
      .withColumn("n_chr", length(col("w")).cast("long"))
      .drop("toks")
    sw.join(encoded, "w")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_tokens"),
        sum(col("cnt") * col("n_chr")).as("n_chars"),
        sum(col("cnt") * col("is_unk")).as("unk_words"))
      .withColumn("fertility_micro", expr("n_tokens * 1000000 div n_words"))
      .withColumn("chars_per_token_micro", expr("n_chars * 1000000 div n_tokens"))
  }
}
