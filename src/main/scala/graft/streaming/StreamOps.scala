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
   * Streaming NEAR-dup dedup: the per-row native MinHash signature
   * ([[graft.expr.MinhashSigX64]] — row-local, no groupBy, so it works
   * on an unbounded stream; same expression the batch path uses) and
   * watermarked dropDuplicates on the rendered signature.
   */
  def minhashDedupStream(df: DataFrame, textCol: String, tsCol: String,
                         shingleSize: Int = 5, numHashes: Int = 8,
                         watermark: String = "10 minutes"): DataFrame = {
    graft.functions.Registry.ensure(df.sparkSession)
    val sig = concat_ws(",", call_function("minhash_sig_x64",
      col(textCol), lit(shingleSize), lit(numHashes)).cast("array<string>"))
    df.withColumn("_minhash_sig", sig)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_minhash_sig"))
      .drop("_minhash_sig")
  }

  /**
   * Streaming incremental dedup against a STATIC reference corpus —
   * the streaming face of [[graft.ops.Dedup.incrementalDedup]]: rows
   * the reference's bloom sketch rules out pass through without
   * touching the join; probable duplicates resolve with a stream-static
   * left-anti join, so emitted rows are EXACTLY the stream rows whose
   * key is absent from the reference. The sketch is built once at
   * query definition from the static side.
   */
  def incrementalDedupStream(stream: DataFrame, refDf: DataFrame, keys: Seq[String],
                             expectedRefDistinct: Long = 1000000L,
                             fpp: Double = 0.01): DataFrame = {
    val keyHash = xxhash64(keys.map(col): _*)
    val bloom = refDf.select(keyHash.as("_h")).stat.bloomFilter("_h", expectedRefDistinct, fpp)
    val flagged = stream.withColumn("_maybe_dup",
      graft.functions.Registry.bloomColumn(keyHash, bloom))
    val clean = flagged.filter(!col("_maybe_dup")).drop("_maybe_dup")
    val resolved = flagged.filter(col("_maybe_dup")).drop("_maybe_dup")
      .join(refDf.select(keys.map(col): _*).distinct(), keys, "left_anti")
    clean.unionByName(resolved)
  }

  /**
   * Streaming perceptual IMAGE dedup: per-row netpbm decode → dHash
   * (row-local, unbounded-safe — the same hash the batch
   * [[graft.ops.Multimodal.imageNearDupPairs]] bands), then
   * watermarked dedup on the hash = exact perceptual duplicates
   * (Hamming 0). Cross-row banded NEAR-dup needs the batch pass —
   * banding is a self-join, unbounded on a stream. Undecodable rows
   * pass through: they have no perceptual identity to collide on.
   * (A Scala UDF is fine here: the decode is opaque byte parsing the
   * batch path also runs as JVM code via mapPartitions — there is no
   * codegen to fall out of.)
   */
  def imageDedupStream(df: DataFrame, contentCol: String, tsCol: String,
                       watermark: String = "10 minutes"): DataFrame = {
    val dhash = udf((bytes: Array[Byte]) =>
      graft.ops.Multimodal.decodeNetpbm(bytes).map(graft.ops.Multimodal.dHash64))
    val hashed = df.withColumn("_dhash", dhash(col(contentCol).cast("binary")))
    hashed.filter(col("_dhash").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_dhash"))
      .unionByName(hashed.filter(col("_dhash").isNull))
      .drop("_dhash")
  }

  /** Streaming perceptual AUDIO dedup — the WAV/[[graft.ops.Multimodal.audioHash64]]
    * twin of [[imageDedupStream]]. */
  def audioDedupStream(df: DataFrame, contentCol: String, tsCol: String,
                       watermark: String = "10 minutes"): DataFrame = {
    val ahash = udf((bytes: Array[Byte]) =>
      graft.ops.Multimodal.decodeWav(bytes).map(graft.ops.Multimodal.audioHash64))
    val hashed = df.withColumn("_ahash", ahash(col(contentCol).cast("binary")))
    hashed.filter(col("_ahash").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_ahash"))
      .unionByName(hashed.filter(col("_ahash").isNull))
      .drop("_ahash")
  }

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long,
                        total_value: Double)
  // not `private`: the state-store encoder codegen needs the public
  // constructor/accessors of the state class
  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /**
   * Gap-based sessionization on an unbounded stream — the streaming
   * twin of the batch `ops.Sessions.sessionize` (same gap rule, same
   * aggregates). flatMapGroupsWithState with EventTimeTimeout: events
   * inside a batch extend or close sessions by the gap rule; a session
   * still open at batch end parks in the state store with a timeout at
   * (last event + gap), and the watermark passing that point fires the
   * timeout and emits the closed session. State per key is one
   * fixed-size struct, so store size is O(active keys) and the
   * watermark bounds its lifetime — nothing touches the driver.
   */
  def sessionizeStream(events: Dataset[UserEvent], gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption
            for (e <- batch.toArray.sortBy(_.ts.getTime)) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(t, s.last), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout at or before the current watermark throws —
              // clamp just past it (the session closes immediately then)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Output-mode helper for tests/callers. */
  def updateMode: OutputMode = OutputMode.Update()
}
