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
}
