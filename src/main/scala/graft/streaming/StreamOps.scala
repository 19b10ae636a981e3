package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming counterparts of the batch operators — the
 * reference is explicitly batch-only ("not suitable for real-time
 * streaming", docs/playbook_development_guide.md:459-460), so this is
 * north-star surface: the same pipeline semantics on an unbounded
 * source with watermarked state.
 *
 * Scale notes: all operators are keyed-state shapes that partition by
 * the grouping key — state lives in the state store per shuffle
 * partition, watermarks bound its growth, and nothing collects to the
 * driver.
 */
object StreamOps {

  /** Tumbling/sliding watermarked window aggregation over an event
    * stream (exact decimal sums, like the batch agg queries). */
  def windowedCounts(events: DataFrame, tsCol: String, valueCol: String,
                     windowDur: String, slide: Option[String] = None,
                     watermark: String = "10 minutes"): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    events.withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n"), col("total"))
  }

  /** Streaming exact dedup on key columns, state bounded by the
    * watermark (the streaming face of Dedup.exact). */
  def dedupStream(df: DataFrame, keys: Seq[String], tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  case class UserEvent(user_id: Long, event_type: String, value: Double,
                       ts: java.sql.Timestamp)
  case class UserStats(user_id: Long, n_events: Long, total_value: Double,
                       last_type: String)

  /** Custom keyed state via mapGroupsWithState: running per-user
    * aggregate emitted on every update (Update output mode). */
  def userRunningStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, ""))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(uid, acc.n_events + 1, acc.total_value + e.value, e.event_type)
          }
          state.update(next)
          next
      }
  }

  /**
   * Streaming NEAR-dup dedup: a per-row MinHash signature (array
   * expression — no groupBy, so it works on an unbounded stream) and
   * watermarked dropDuplicates on the signature. Batch pipelines use
   * the explode+agg signatures in Dedup (faster); streams need the
   * stateless per-row shape.
   */
  def minhashDedupStream(df: DataFrame, textCol: String, tsCol: String,
                         shingleSize: Int = 5, numHashes: Int = 8,
                         watermark: String = "10 minutes"): DataFrame = {
    val shingles = graft.ops.Dedup.charShingles(col(textCol), shingleSize)
    val sig = concat_ws(",", (0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)
    df.withColumn("_minhash_sig", sig)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_minhash_sig"))
      .drop("_minhash_sig")
  }

  /** Output-mode helper for tests/callers. */
  def updateMode: OutputMode = OutputMode.Update()
}
