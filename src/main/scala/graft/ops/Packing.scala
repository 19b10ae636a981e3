package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training batches: documents are concatenated
 * into a token stream per shard and chunked into fixed-capacity
 * context windows — the "concat-and-chunk" packing used by
 * pretraining pipelines. Each doc gets the window its FIRST token
 * lands in plus a `straddles` flag (it crosses into the next window,
 * where the consumer either splits or masks across the boundary).
 *
 * Shape at 100 TB: one window (sum over shard, ordered by id) per
 * shard — shards bound both the sort size and the parallelism, so
 * pick shards >> executors. Assignment is a pure function of
 * (shard, id order), so reruns and repartitions give identical packs.
 */
object Packing {

  def packWindows(docs: DataFrame, idCol: String, textCol: String,
                  capacity: Int, shards: Int = 64): DataFrame = {
    val tok = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards)))
      .withColumn("n_tokens", tok)
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        floor(col("start_off") / capacity).as("window_id"),
        (floor((col("start_off") + col("n_tokens") - 1) / capacity) >
          floor(col("start_off") / capacity)).as("straddles"))
  }

  /**
   * Length-bucketed inference batches: within each hash shard, docs
   * sort by token count so every batch of `batchSize` holds
   * near-equal lengths — the standard padding-waste minimizer for
   * batched inference/embedding jobs (a batch pads every sequence to
   * its max; sorting makes max ≈ min). Reports each doc's batch plus
   * the batch max and the doc's own pad waste.
   *
   * Shape at 100 TB: the sort is per-SHARD (never global) over
   * (id, n_tokens) pairs only — the text is dropped before any
   * exchange; the batch-max window repartitions the same narrow rows
   * by (shard, batch). Assignment is a pure function of (shard,
   * length, id) — reruns give identical batches.
   */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    batchSize: Int, shards: Int = 64): DataFrame = {
    require(batchSize >= 1 && shards >= 1, "need positive batchSize/shards")
    val tok = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val order = Window.partitionBy(col("shard"))
      .orderBy(col("n_tokens"), col(idCol))
    val batch = Window.partitionBy(col("shard"), col("batch_idx"))
    docs
      .select(col(idCol), pmod(col(idCol), lit(shards)).as("shard"), tok.as("n_tokens"))
      .withColumn("_rn", row_number().over(order))
      .withColumn("batch_idx", expr(s"(_rn - 1) div $batchSize"))
      .drop("_rn")
      .withColumn("batch_max", max(col("n_tokens")).over(batch))
      .withColumn("pad_tokens", col("batch_max") - col("n_tokens"))
  }

  /**
   * Per-document token CHUNKING with overlap — the long-document
   * splitter that runs BEFORE packing: each doc becomes
   * ceil((n_tokens - overlap) / stride) chunks of up to `chunkTokens`
   * whitespace tokens, consecutive chunks sharing `overlap` tokens
   * (retrieval/embedding prep: the overlap keeps boundary context in
   * both chunks). Row-local (tokenize + slice windows + posexplode, no
   * shuffle); deterministic chunk ids = (doc id, chunk index). Docs at
   * or under `chunkTokens` pass through as their own single chunk.
   */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = Dedup.tokens(col(textCol))
    // chunk starts: 0, stride, 2*stride, ... while start + overlap < n
    // (the last chunk begins before the tail would be pure overlap)
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkTokens)), " "))
    docs.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      // count by splitting the RAW chunk text (no trim/lowercase): the
      // doc tokenizer can emit empty tokens (e.g. leading tab survives
      // trim), and the rejoined chunk then carries boundary spaces —
      // a trimming recount would disagree with a plain split count.
      .withColumn("chunk_tokens", size(split(col("chunk_text"), "\\s+", -1)))
  }
}
