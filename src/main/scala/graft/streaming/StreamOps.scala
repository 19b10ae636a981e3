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

  /**
   * Streaming min/max dedup — the online face of
   * [[graft.ops.Dedup.byExtreme]]: keep, per key, the single record
   * whose `strategyField` is the extreme under the reference's
   * CompareValues order (transform.go:1052-1117 as driven by the
   * processor's strict-improvement fold, processor.go:295-307):
   * nil smallest; numbers AND numeric strings compare as float64
   * (the shared [[graft.functions.GoFloatParse]] parser — the exact
   * JVM code the batch path's `go_parse_float` expression calls, so
   * the two faces cannot drift); non-numeric strings compare
   * lexicographically among themselves and rank above all numerics;
   * ties and incomparables keep the EARLIEST arrival (streaming's
   * statement of "earliest ingested", same caveat as the `first`
   * strategy's dropDuplicates).
   *
   * Emission contract (Append mode, file-sink compatible): a key's
   * current extreme row is held in keyed state and emitted once the
   * key has been QUIET for `quiet` of EVENT time — the watermark on
   * `tsCol` (delayed by `watermarkDelay`) passing the key's last-seen
   * event time + `quiet` fires an EventTimeTimeout, the row is
   * appended, the state dropped: the session-close pattern. A key
   * that keeps receiving rows keeps improving silently; a
   * re-appearing key after emission starts a fresh round (may emit
   * again — downstream min/max compaction is associative, so the
   * extreme of extremes is still THE extreme). Event-time (not
   * processing-time) timers are load-bearing here: they make the
   * operator deterministic under replay AND terminate under
   * Trigger.AvailableNow — a processing-time timer keeps scheduling
   * wall-clock batches, so a bounded catch-up run would either hang
   * or race its own clock.
   *
   * Scale shape: one shuffle on the key; state is exactly one row per
   * live key (the current extreme — not the arrivals), bounded by the
   * quiet-period turnover, per-partition in the state store.
   */
  def dedupExtremeStream(df: DataFrame, keys: Seq[String], strategyField: String,
                         max: Boolean, tsCol: String,
                         quiet: String = "30 seconds",
                         watermarkDelay: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val wm = df.withWatermark(tsCol, watermarkDelay)
    val schema = wm.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val fIdx = schema.fieldIndex(strategyField)
    val tsIdx = schema.fieldIndex(tsCol)
    val isString = schema(fIdx).dataType.isInstanceOf[StringType]
    val keySchema = StructType(keyIdx.map(schema(_)).toArray)
    val quietMs = intervalMs(quiet)
    // state = the extreme row's fields + the key's max seen event time
    val stateSchema = StructType(schema.fields :+ StructField("_graft_seen_ts", LongType))
    val rowEnc = Encoders.row(schema)
    wm.groupByKey((r: Row) => Row.fromSeq(keyIdx.map(r.get)))(Encoders.row(keySchema))
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[Row]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Row.fromSeq(s.toSeq.dropRight(1)))
          } else {
            var (cur, seenTs) = state.getOption match {
              case Some(s) => (Row.fromSeq(s.toSeq.dropRight(1)), s.getLong(schema.length))
              case None => (null: Row, Long.MinValue)
            }
            rows.foreach { r =>
              val ts = r.get(tsIdx) match {
                case t: java.sql.Timestamp => t.getTime
                case t: java.time.Instant => t.toEpochMilli
                case _ => Long.MinValue // null ts rows still compete on value
              }
              if (ts > seenTs) seenTs = ts
              if (cur == null ||
                  strictlyBetter(r.get(fIdx), cur.get(fIdx), isString, max))
                cur = r
            }
            if (cur != null) {
              state.update(Row.fromSeq(cur.toSeq :+ seenTs))
              // a late batch can put seenTs+quiet at or behind the
              // watermark (setTimeoutTimestamp rejects that) — clamp a
              // hair past it so the key emits on the next advance
              state.setTimeoutTimestamp(
                math.max(seenTs + quietMs, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }(Encoders.row(stateSchema), rowEnc)
      .toDF()
  }

  /** CalendarInterval string ("30 seconds", "5 minutes") to millis. */
  private def intervalMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.safeStringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv != null && iv.months == 0, s"unparseable interval '$s'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** CompareValues strict improvement: true iff `cand` strictly beats
    * `inc` for the requested extreme (ties keep the incumbent = the
    * earlier arrival). String columns use the 3-class order the batch
    * [[graft.ops.Dedup.byExtreme]] states (nil < numeric < non-numeric
    * lex); native types use natural order with nil smallest. */
  private[streaming] def strictlyBetter(cand: Any, inc: Any,
                                        isString: Boolean, max: Boolean): Boolean = {
    val c = compareGo(cand, inc, isString)
    if (max) c > 0 else c < 0
  }

  private def compareGo(a: Any, b: Any, isString: Boolean): Int =
    if (isString) {
      def numOf(v: Any): java.lang.Double =
        if (v == null) null
        else graft.functions.GoFloatParse.parse(
          org.apache.spark.unsafe.types.UTF8String.fromString(v.toString))
      val (na, nb) = (numOf(a), numOf(b))
      def cls(v: Any, n: java.lang.Double) = if (v == null) 0 else if (n != null) 1 else 2
      val (ca, cb) = (cls(a, na), cls(b, nb))
      if (ca != cb) ca - cb
      else if (ca == 1) java.lang.Double.compare(na, nb)
      else if (ca == 2) a.toString.compareTo(b.toString)
      else 0
    } else (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
      case (x: java.lang.Float, y: java.lang.Float) => java.lang.Float.compare(x, y)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
      case (x: Number, y: Number) => java.lang.Long.compare(x.longValue(), y.longValue())
      case (x: Comparable[_], y) if x.getClass == y.getClass =>
        x.asInstanceOf[Comparable[Any]].compareTo(y)
      case _ => 0 // incomparable -> tie -> earliest arrival wins
    }

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

  case class FunnelProgress(user_id: Long, completed: Int, step_us: Seq[Long])

  /**
   * Streaming ordered funnel — the online face of
   * [[graft.ops.Funnels.funnel]]: per-key step-chain state via
   * mapGroupsWithState, emitting each key's progress (completed step
   * count + completion timestamps in epoch micros) on every update.
   * Same strictly-after chain semantics as the batch fold, applied
   * incrementally: events are sorted WITHIN a micro-batch, so the
   * result equals the batch funnel whenever events arrive
   * batch-ordered; an event that lands in an earlier position after
   * its successor step was already taken cannot retro-advance the
   * chain (streaming funnels are order-sensitive across batches —
   * re-run the batch operator for the exact backfill).
   *
   * State is k longs per key — bounded by design, no collect anywhere;
   * pair with a state-store TTL (GroupStateTimeout) in deployments
   * where keys are unbounded.
   */
  def funnelStream(events: Dataset[UserEvent], steps: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    val stepSet = steps.toSet
    events.filter(e => stepSet(e.event_type))
      .groupByKey(_.user_id)
      .mapGroupsWithState[Array[Long], FunnelProgress](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[Array[Long]]) =>
          val st = state.getOption.getOrElse(Array.fill(k)(Long.MinValue))
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
            val done = st.count(_ != Long.MinValue)
            val us = e.ts.getTime * 1000L
            if (done < k && steps(done) == e.event_type &&
                (done == 0 || us > st(done - 1))) st(done) = us
          }
          state.update(st)
          FunnelProgress(uid, st.count(_ != Long.MinValue),
            st.filter(_ != Long.MinValue).toSeq)
      }
  }

  case class TransitionOut(user_id: Long, prev_type: String, next_type: String)

  /**
   * Streaming face of [[graft.ops.Funnels.eventTransitions]]: per-key
   * state is ONLY the last seen (ts, type) — each batch sorts its own
   * events (same (ts, type) order as the batch lag window), emits one
   * row per observed transition, and the cross-batch boundary
   * transition comes from the carried state. Late events that sort
   * before the carried last-event are the batch operator's backfill
   * boundary (documented, same stance as funnelStream). Downstream a
   * `groupBy(prev_type, next_type).count()` in update mode is the
   * live transition matrix; the emitted rows ARE the increments.
   */
  def transitionStream(events: Dataset[UserEvent]): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, String), TransitionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[(Long, String)]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[TransitionOut]
          for (e <- sorted) {
            last.foreach { case (_, pt) => out += TransitionOut(uid, pt, e.event_type) }
            last = Some((e.ts.getTime, e.event_type))
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /**
   * Watermarked STREAM-STREAM interval join (the streaming face of
   * the batch range join `q_range_join`): left events matched to
   * right events on the key with r.ts in [l.ts, l.ts + maxLag]. Both
   * sides carry watermarks and the join condition bounds event-time
   * distance, which is exactly what lets Spark expire buffered state:
   * a left row older than (right watermark − maxLag) can never match
   * again and is evicted. Column names must be disjoint (the caller
   * renames); keyCols are the equi-join columns pairwise
   * (leftKey, rightKey).
   *
   * Scale shape: state-store hash join partitioned by the key — the
   * same single key shuffle per side a batch shuffle join costs, with
   * state bounded by watermark + lag instead of table size.
   */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTs: String, rightTs: String,
                         maxLagSeconds: Long,
                         watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxLagSeconds SECONDS"))
  }

  case class AttributionOut(user_id: Long, channel: String, value: Double)

  /**
   * Streaming face of [[graft.ops.Funnels.attribution]]: per-key state
   * is ONLY the last touch-typed event's type — each batch sorts its
   * own events (same (ts, type) order stance as [[transitionStream]]),
   * touches update the carried channel, conversions emit one
   * (channel, value) credit row ('none' before any touch). Downstream
   * a `groupBy(channel).agg(sum)` in update mode is the live
   * attribution report; the emitted rows ARE the increments. Late
   * touches that sort before an already-credited conversion are the
   * batch operator's backfill boundary.
   */
  def attributionStream(events: Dataset[UserEvent], conversionType: String,
                        touchTypes: Set[String]): Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[String, AttributionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[String]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          var touch = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AttributionOut]
          for (e <- sorted) {
            if (touchTypes(e.event_type)) touch = Some(e.event_type)
            else if (e.event_type == conversionType)
              out += AttributionOut(uid, touch.getOrElse("none"), e.value)
          }
          touch.foreach(state.update)
          out.iterator
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
   * Streaming perplexity scoring under a PERSISTED reference LM — the
   * online face of [[graft.ops.LmIndex.scoreMknIndexed]] and the last
   * leg of the CCNet lifecycle: the mkn3 model is fitted ONCE on the
   * clean corpus ([[graft.ops.LmIndex.writeMknIndex]]) and every
   * arriving crawl document is scored against it as it lands. The
   * model loads at query definition through the verified stamp (loud
   * on STALE), prunes to `maxTypes` rows per order (the KenLM pruning
   * shape — see [[graft.ops.LmIndex.loadMknLocal]]), and rides to
   * executors by closure — scoring is then ROW-LOCAL (the identical
   * IEEE tree as batch, spec-pinned equal when unpruned): no
   * streaming state, no watermark, no join, so it composes with any
   * downstream stateful stage. Appends n_tokens / sum_nll_micro /
   * avg_nll_micro to the stream; null-text rows pass through with
   * NULL scores (annotate, don't drop — the ppl_partition convention).
   */
  def pplScoreStream(stream: DataFrame, textCol: String,
                     trainPath: String, indexPath: String,
                     maxTypes: Int = 200000): DataFrame = {
    val model = graft.ops.LmIndex.loadMknLocal(stream.sparkSession,
      trainPath, indexPath, textCol, maxTypes)
    val score = udf((text: String) =>
      Option(text).map(t => model.scoreDoc(graft.ops.LmIndex.sparkTokens(t))))
    // evaluation barrier: see tokenizeFertilityStream — without it the
    // pure UDF can inline into all three field extractions and score
    // each doc three times after projection collapse
    stream.withColumn("_ppl", score.asNondeterministic()(col(textCol)))
      .withColumn("n_tokens", col("_ppl._1"))
      .withColumn("sum_nll_micro", col("_ppl._2"))
      .withColumn("avg_nll_micro", col("_ppl._3"))
      .drop("_ppl")
  }

  /**
   * Streaming tokenizer encode/fertility under a PERSISTED
   * [[graft.ops.TokenizerIndex]] artifact — the online face of
   * [[graft.ops.TokenizerIndex.fertilityIndexed]] and the tokenizer
   * half of the [[pplScoreStream]] contract: the model (merge ranks /
   * vocabulary / unigram logprobs) loads ONCE at query definition
   * through the verified stamp (loud on STALE) and rides to executors
   * by closure; every arriving doc is then scored ROW-LOCALLY with the
   * SAME word-level encoders the batch report runs — no streaming
   * state, no watermark, no join, composes with any downstream stage.
   *
   * Appends per-doc columns n_words / n_tokens / n_chars (n_bytes for
   * byte-level BPE — its units are bytes by construction) /
   * fertility_micro / chars_per_token_micro (bytes_per_token_micro for
   * bbpe), plus unk_words for WordPiece; null-text rows pass through
   * with NULL scores (annotate, don't drop). Tokenization is the
   * [[graft.ops.LmIndex.sparkTokens]] replica of the batch
   * split(lower(trim(text))) — the Spark-exact edge semantics the
   * stream==batch twin contract needs — and the char unit is the
   * CODEPOINT count (Spark `length`), not Java's UTF-16 length.
   * Contract (spec-pinned per family): aggregating the stream's
   * per-doc counts by source and re-deriving the integer micros
   * reproduces the batch per-source report EXACTLY.
   *
   * A bounded per-task memo caches word→(tokens, unk) — the streaming
   * stand-in for the batch plan's distinct-word encode relation.
   */
  def tokenizeFertilityStream(stream: DataFrame, textCol: String, family: String,
                              trainPath: String, indexPath: String,
                              maxPieceLen: Int = 8): DataFrame = {
    import graft.ops.{LmIndex, Tokenizer, TokenizerIndex}
    val spark = stream.sparkSession
    // (word → (n_tokens, is_unk)) under the loaded artifact
    val encodeWord: String => (Long, Long) = family match {
      case "bpe" =>
        val m = TokenizerIndex.loadMerges(spark, trainPath, indexPath, "bpe", textCol)
          .toIndexedSeq
        w => (Tokenizer.applyMerges(w, m).length.toLong, 0L)
      case "bbpe" =>
        val m = TokenizerIndex.loadMerges(spark, trainPath, indexPath, "bbpe", textCol)
          .toIndexedSeq
        w => (Tokenizer.bbpeEncode(w, m).length.toLong, 0L)
      case "wordpiece" =>
        val v = TokenizerIndex.loadVocabSet(spark, trainPath, indexPath, textCol)
        w => {
          val toks = Tokenizer.wordpieceEncode(w, v)
          (toks.length.toLong,
            if (toks.length == 1 && toks(0) == "[UNK]") 1L else 0L)
        }
      case "unigram" =>
        val v = TokenizerIndex.loadVocabMap(spark, trainPath, indexPath, textCol)
        w => (Tokenizer.unigramEncode(w, v, maxPieceLen).length.toLong, 0L)
      case other => throw new IllegalArgumentException(
        s"tokenizer family '$other' — expected bpe | bbpe | wordpiece | unigram")
    }
    val byteUnits = family == "bbpe"
    // per-task word memo: each task deserializes its own closure copy,
    // so no cross-thread sharing. Access-ordered LinkedHashMap = true
    // LRU — evict one cold entry at the bound instead of clearing the
    // whole hot set (a wholesale clear() re-encoded the entire working
    // vocabulary every 65 536 words — r14 advisory).
    val memo = new java.util.LinkedHashMap[String, (Long, Long)](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long)]): Boolean = size() > 65536
    }
    val score = udf((text: String) => Option(text).map { t =>
      val words = LmIndex.sparkTokens(t)
      var nw = 0L; var nt = 0L; var nu = 0L; var unk = 0L
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var e = memo.get(w)
        if (e == null) {
          e = encodeWord(w)
          memo.put(w, e) // removeEldestEntry evicts LRU at the bound
        }
        nw += 1; nt += e._1; unk += e._2
        nu += (if (byteUnits) w.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
               else w.codePointCount(0, w.length).toLong)
        i += 1
      }
      (nw, nt, nu, unk)
    })
    val unitCol = if (byteUnits) "n_bytes" else "n_chars"
    val ratioCol = if (byteUnits) "bytes_per_token_micro" else "chars_per_token_micro"
    // asNondeterministic is an EVALUATION BARRIER, not a semantics
    // change (the function is pure): CollapseProject will not inline a
    // non-deterministic expression into the four field extractions
    // below, so each row encodes ONCE instead of up to once per
    // extracted field (r14 advisory).
    val base = stream.withColumn("_tf", score.asNondeterministic()(col(textCol)))
      .withColumn("n_words", col("_tf._1"))
      .withColumn("n_tokens", col("_tf._2"))
      .withColumn(unitCol, col("_tf._3"))
    val withUnk =
      if (family == "wordpiece") base.withColumn("unk_words", col("_tf._4"))
      else base
    // nullif: a zero-token doc (e.g. empty string → the one empty
    // word) has no meaningful ratio — NULL, not a division error
    // (per-doc rows can be degenerate where the batch report's
    // per-source sums cannot)
    withUnk
      .withColumn("fertility_micro",
        expr("n_tokens * 1000000 div nullif(n_words, 0)"))
      .withColumn(ratioCol, expr(s"$unitCol * 1000000 div nullif(n_tokens, 0)"))
      .drop("_tf")
  }

  /**
   * Streaming CCNet banding: score each arriving doc under the
   * persisted reference LM ([[pplScoreStream]]) and band it against
   * STATIC per-source NLL cutoffs — the streamable form of
   * [[graft.ops.TextAnalysis.perplexityPartition]]'s ntile, and what
   * CCNet actually does online (Wenzek 2020 computes the head/middle
   * percentile thresholds on a sample once, then cuts every shard by
   * those fixed numbers; a global ntile needs the whole corpus and
   * cannot stream). `cutoffs` is one row per source
   * (source, head_max_micro, middle_max_micro), typically derived
   * from a batch `perplexityPartition` run:
   *   avg_nll ≤ head_max → head; ≤ middle_max → middle; else tail;
   * an unknown source or an unscoreable doc bands NULL (annotate,
   * don't drop). Stream-static broadcast join + the row-local scorer:
   * still stateless, composes with any downstream stage.
   */
  def pplBandStream(stream: DataFrame, textCol: String, sourceCol: String,
                    cutoffs: DataFrame, trainPath: String, indexPath: String,
                    maxTypes: Int = 200000): DataFrame = {
    val scored = pplScoreStream(stream, textCol, trainPath, indexPath, maxTypes)
    scored.join(broadcast(cutoffs.select(col("source"),
        col("head_max_micro"), col("middle_max_micro"))),
        scored(sourceCol) === cutoffs("source"), "left_outer")
      .drop(cutoffs("source"))
      .withColumn("ppl_band",
        when(col("avg_nll_micro").isNull, lit(null: String))
          .when(col("head_max_micro").isNotNull &&
            col("avg_nll_micro") <= col("head_max_micro"), lit("head"))
          .when(col("middle_max_micro").isNotNull &&
            col("avg_nll_micro") <= col("middle_max_micro"), lit("middle"))
          .when(col("middle_max_micro").isNotNull, lit("tail"))
          .otherwise(lit(null: String)))
      .drop("head_max_micro", "middle_max_micro")
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
   * Streaming EXACT-dedup ingest face — the cheapest and most common
   * first pass of a streaming corpus ingest, stated as one named
   * operator: a row is emitted iff (a) its key tuple is absent from
   * the persisted SEEN-STATE (`refDf` — typically the key relation of
   * every previously-accepted corpus version, read from a state
   * table) and (b) it is the first arrival with that key within the
   * watermark. Emitted rows are exactly the batch contract of
   * [[graft.ops.Dedup.incrementalDedup]] (ref screen) followed by
   * [[graft.ops.Dedup.byIngestOrder]] keepFirst on the delta
   * (first-arrival-wins — the two screens commute on the kept SET,
   * spec-pinned against the oracled q_llm_dedup_exact computation).
   *
   * State-roll convention (the near-dup chain's, one level simpler
   * because exact keys carry no signature): the kept rows' keys ARE
   * the state delta — state(N+1) = state(N) ∪ keys(kept) — so the
   * caller appends the emitted keys to the seen-state table at each
   * roll and successive ingest windows chain without re-reading old
   * corpus text. Nothing but the key columns ever enters the state.
   *
   * Scale shape: the intra-stream screen is watermark-bounded keyed
   * state (`dropDuplicatesWithinWatermark` — one shuffle on the
   * keys); the seen-state screen is the bloom-prefiltered stream-
   * static anti-join of [[incrementalDedupStream]], so rows the
   * sketch rules out never touch the join and the static side ships
   * keys only.
   */
  def exactDedupStream(stream: DataFrame, refDf: DataFrame, keys: Seq[String],
                       tsCol: String, watermark: String = "10 minutes",
                       expectedRefDistinct: Long = 1000000L,
                       fpp: Double = 0.01): DataFrame =
    incrementalDedupStream(
      stream.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys),
      refDf, keys, expectedRefDistinct, fpp)

  /**
   * Streaming canonical-URL dedup — the online face of
   * [[graft.ops.Urls.urlDedupVerdicts]]: first occurrence of each
   * CANONICAL url within the watermark wins, later arrivals drop.
   * Rows whose url does not canonicalize (null) bypass the dedup
   * entirely — `dropDuplicates` would otherwise collapse ALL null
   * keys into one surviving row, which is the opposite of the batch
   * contract (a null never collides). State is keyed by the canonical
   * string and bounded by the watermark.
   */
  def urlDedupStream(stream: DataFrame, urlCol: String, tsCol: String,
                     watermark: String = "10 minutes"): DataFrame = {
    val canon = stream.withColumn("_canon",
      graft.ops.Urls.normalizeUrl(col(urlCol)))
    val deduped = canon.filter(col("_canon").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_canon"))
    deduped.unionByName(canon.filter(col("_canon").isNull)).drop("_canon")
  }

  /**
   * Streaming near-dup verdicts against a STATIC signature state —
   * the online face of [[graft.ops.Dedup.incrementalNearDupVerdicts]]'
   * reference screen. Each incoming doc computes its MinHash signature
   * row-locally (native `minhash_sig_x64`), explodes its LSH band
   * keys, and left-joins the state's band index (stream-static,
   * append-safe); per doc the minimum matching reference id wins.
   * Output: (id, status ∈ dup_of_ref|kept, match_id).
   *
   * The new-new phase is deliberately ABSENT here: in-flight rows are
   * judged only against the frozen state — the same incremental
   * contract the batch operator states (reference screen first), with
   * intra-stream duplication resolved at the next state roll (batch
   * the kept docs' signatures into state' and restart). The state
   * band index is bucket-bounded (`maxBucketSize`, the boilerplate-
   * bucket skew bound) and persists via CachedRelations.
   */
  def nearDupVerdictStream(stream: DataFrame, refSig: DataFrame,
                           idCol: String, textCol: String,
                           shingleSize: Int, numHashes: Int, bands: Int,
                           threshold: Double,
                           maxBucketSize: Int = 1000): DataFrame = {
    import graft.ops.{CachedRelations, Dedup}
    import refSig.sparkSession.implicits._
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    graft.functions.Registry.ensure(refSig.sparkSession)
    val bandRef0 = refSig.select(col("id").as("rid"), col("sig").as("rsig"),
      posexplode(Dedup.sigBandKeys(col("sig"), numHashes, bands, portable = false))
        .as(Seq("band", "bucket")))
    val okBuckets = bandRef0.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bandRef = CachedRelations.track(
      bandRef0.join(okBuckets, Seq("band", "bucket")).persist())
    val sigd = stream.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        call_function("minhash_sig_x64", col(textCol),
          lit(shingleSize), lit(numHashes)).as("sig"))
    val banded = sigd.select(col("id"), col("sig"),
      posexplode(Dedup.sigBandKeys(col("sig"), numHashes, bands, portable = false))
        .as(Seq("band", "bucket")))
    banded.join(bandRef, Seq("band", "bucket"), "left_outer")
      .select(col("id"),
        when(col("rid").isNotNull &&
          Dedup.sigAgreement(col("sig"), col("rsig"), numHashes) >= threshold,
          col("rid")).as("m"))
      .as[(Long, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String, Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Option[Long])], _: GroupState[Boolean]) =>
          val matches = rows.flatMap(_._2).toSeq
          if (matches.isEmpty) Iterator((id, "kept", None))
          else Iterator((id, "dup_of_ref", Some(matches.min)))
      }
      .toDF("id", "status", "match_id")
  }

  /**
   * Streaming boilerplate-line filter — the online face of
   * [[graft.ops.Dedup.boilerplateLineRemoval]]. The boilerplate set
   * (per-domain line hashes) comes from the batch pass over yesterday's
   * corpus; each incoming doc is scrubbed ROW-LOCALLY against it:
   * the (domain, hash) set collects once at plan time and rides the
   * stream as a literal map-side structure — a pure map with no
   * streaming state, no watermark, no join, so it composes with any
   * downstream stateful stage. (Same literal-inlining shape as batch
   * centroid classification; a boilerplate set too large to inline —
   * >~10^5 domains×lines — should use a stream-static left_anti join
   * on the exploded lines instead, at the cost of a per-batch join.)
   * Docs whose every line was boilerplate are dropped, as in C4.
   */
  def boilerplateFilterStream(stream: DataFrame, idCol: String, textCol: String,
                              domainCol: String, boiler: DataFrame,
                              lineDelim: String = "\n"): DataFrame = {
    // (domain, hash) pairs -> one literal array of "domain\u0000hash"
    // probes (a scalar set; map_from literal entries would need a
    // struct-keyed map, which array_contains on a concat key avoids)
    val probes: Array[String] = boiler
      .select(concat_ws("\u0000", col("domain"), col("h").cast("string")))
      .collect().map(_.getString(0))
    val probeLit = lit(probes)
    val lines = split(col(textCol), java.util.regex.Pattern.quote(lineDelim))
    val kept = filter(lines, l => !array_contains(probeLit,
      concat_ws("\u0000", col(domainCol), xxhash64(l).cast("string"))))
    stream
      .withColumn("_kept", kept)
      .filter(size(col("_kept")) > 0)
      .select(col(idCol), col(domainCol),
        array_join(col("_kept"), lineDelim).as("clean_text"),
        size(col("_kept")).as("kept_lines"),
        size(lines).as("total_lines"))
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
      graft.ops.Multimodal.decodePcm(bytes).map(graft.ops.Multimodal.audioHash64))
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

  /**
   * Stream-static IVF ANN lookup — the online-retrieval face of
   * [[graft.ops.Similarity.ivfTopK]]: the static corpus is indexed
   * ONCE at plan time (the same sampled k-means fit and centroid
   * literals as the batch path) and persisted; each micro-batch of
   * query vectors ranks its `nprobe` nearest cells ROW-LOCALLY
   * (array_sort over the centroid literals — the batch path's window
   * rank is not allowed on a stream, and a per-row sort of `nlist`
   * structs is cheaper anyway), stream-static inner joins the
   * (cell -> candidates) index, and resolves exact-cosine top-k per
   * query in flatMapGroupsWithState.
   *
   * ALL of a query's candidates are produced inside its own
   * micro-batch (the cell fan-out is a deterministic function of the
   * stream row), so each group sees its full candidate set in one
   * invocation and the state slot stays empty — it exists only
   * because Structured Streaming has no stateless per-group fold in
   * append mode. Unlike the batch self-join, a lookup does NOT
   * exclude qid == nid: query and corpus ids are different
   * namespaces. Queries probing only empty cells emit nothing.
   *
   * The persisted index is registered with
   * [[graft.ops.CachedRelations]] — callers release after stopping
   * the stream.
   */
  def ivfLookupStream(queries: DataFrame, corpus: DataFrame, idCol: String,
                      vecCol: String, dims: Int, k: Int,
                      nlist: Int = 16, nprobe: Int = 2,
                      maxFitVectors: Long = 100000L): DataFrame = {
    import graft.ops.{CachedRelations, Similarity}
    import corpus.sparkSession.implicits._
    val v = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val (assigned, cents) = Similarity.ivfFit(v, dims, nlist, maxFitVectors)
    val index = CachedRelations.track(
      assigned.select(col("id").as("nid"), col("v").as("nv"), col("cell"))
        .withColumn("nn", Similarity.norm(col("nv"))).persist())
    // row-local probe ranking: (|c|^2 - 2 q.c, ci) ascending — the
    // same Euclidean order probeCells uses, as a struct array_sort
    val centLits = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ci"), lit(c).as("cv"),
        lit(c.map(x => x * x).sum).as("cn2"))
    }.toIndexedSeq: _*)
    val probed = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .withColumn("cell", explode(slice(array_sort(transform(centLits, c =>
        struct((c.getField("cn2") - lit(2.0) * Similarity.dot(col("qv"), c.getField("cv"))).as("d"),
          c.getField("ci").as("ci")))), 1, nprobe).getField("ci")))
    probed.join(index, "cell")
      .select(col("qid"), col("nid"),
        (Similarity.dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Double, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Boolean]) =>
          rows.toArray.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
            .map { case ((_, nid, cos), i) => (qid, nid, cos, i + 1) }.iterator
      }
      .toDF("qid", "nid", "cos", "rank")
  }

  /**
   * Stream-static ANN lookup through a PERSISTED, verified
   * [[graft.ops.AnnIndex]] IVF artifact — [[ivfLookupStream]] with the
   * fit taken out of the hot path: the stamp verifies ONCE at query
   * definition (loud on STALE — the streaming face must not probe
   * cells that describe a corpus that moved), the persisted centroids
   * load as plan literals, and the persisted codes (id, v, nrm, cell)
   * are the static join side — nothing refits, and the corpus table
   * is never read (the codes carry the vectors and norms). Each
   * micro-batch of query vectors ranks its `nprobe` nearest cells
   * ROW-LOCALLY (the same array_sort form as [[ivfLookupStream]] —
   * the batch path's window rank is not allowed on a stream), joins
   * the cell-keyed codes, and resolves exact-cosine top-k per query
   * in flatMapGroupsWithState. Stream==batch contract (spec-pinned):
   * aggregated over the same query set, the emitted rows equal
   * [[graft.ops.AnnIndex.ivfLookupIndexed]] at the same (k, nprobe).
   *
   * The loaded code relation is persisted and registered with
   * [[graft.ops.CachedRelations]] — callers release after stopping
   * the stream.
   */
  def annLookupStream(queries: DataFrame, tablePath: String, indexPath: String,
                      k: Int, nprobe: Int = 2): DataFrame = {
    import graft.ops.{AnnIndex, CachedRelations, Similarity}
    val spark = queries.sparkSession
    import spark.implicits._
    val meta = AnnIndex.verify(spark, tablePath, indexPath, "ivf")
    val cents = AnnIndex.loadCentroids(spark, indexPath)
    val index = CachedRelations.track(
      spark.read.parquet(s"$indexPath/codes")
        .select(col("id").as("nid"), col("v").as("nv"), col("nrm").as("nn"),
          col("cell"))
        .persist())
    val centLits = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ci"), lit(c).as("cv"),
        lit(c.map(x => x * x).sum).as("cn2"))
    }.toIndexedSeq: _*)
    val probed = queries.filter(col(meta.vecCol).isNotNull)
      .select(col(meta.idCol).as("qid"),
        col(meta.vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .withColumn("cell", explode(slice(array_sort(transform(centLits, c =>
        struct((c.getField("cn2") - lit(2.0) * Similarity.dot(col("qv"), c.getField("cv"))).as("d"),
          c.getField("ci").as("ci")))), 1, nprobe).getField("ci")))
    probed.join(index, "cell")
      .select(col("qid"), col("nid"),
        (Similarity.dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Double, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[Boolean]) =>
          rows.toArray.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
            .map { case ((_, nid, cos), i) => (qid, nid, cos, i + 1) }.iterator
      }
      .toDF("qid", "nid", "cos", "rank")
  }

  /**
   * Streaming kNN classification against a STATIC labeled corpus: the
   * online face of [[graft.ops.Similarity.knnClassifyFrom]] over the
   * IVF lookup — each incoming vector probes its `nprobe` nearest
   * cells (row-local against the literal-inlined centroids), exact
   * cosine ranks the candidates, and the majority label among the
   * top k wins with the SAME deterministic tie-break as the batch
   * rule (votes desc, best rank, label asc). Index fits once on the
   * corpus and persists via CachedRelations; per batch the only
   * exchange is the candidate-volume cell join + the per-query group.
   */
  def classifyStream(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, labelCol: String, dims: Int, k: Int,
                     nlist: Int = 16, nprobe: Int = 2,
                     maxFitVectors: Long = 100000L): DataFrame = {
    import graft.ops.{CachedRelations, Similarity}
    import corpus.sparkSession.implicits._
    val v = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val (assigned, cents) = Similarity.ivfFit(v, dims, nlist, maxFitVectors)
    // ivfFit keeps only (id, v, cell); labels rejoin once at index
    // build (12-byte rows, the persisted index pays it a single time)
    val labels = corpus.select(col(idCol).as("id"), col(labelCol).cast("long").as("lbl"))
    val index = CachedRelations.track(
      assigned.select(col("id"), col("v").as("nv"), col("cell"))
        .join(labels, "id")
        .select(col("id").as("nid"), col("nv"), col("lbl"), col("cell"))
        .withColumn("nn", Similarity.norm(col("nv"))).persist())
    val centLits = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ci"), lit(c).as("cv"),
        lit(c.map(x => x * x).sum).as("cn2"))
    }.toIndexedSeq: _*)
    val probed = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
      .withColumn("cell", explode(slice(array_sort(transform(centLits, c =>
        struct((c.getField("cn2") - lit(2.0) * Similarity.dot(col("qv"), c.getField("cv"))).as("d"),
          c.getField("ci").as("ci")))), 1, nprobe).getField("ci")))
    probed.join(index, "cell")
      .select(col("qid"), col("nid"), col("lbl"),
        (Similarity.dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Long, Double)], state: GroupState[Boolean]) =>
          val top = rows.toArray.sortBy(r => (-r._4, r._2)).take(k)
          if (top.isEmpty) Iterator.empty
          else {
            val votes = top.zipWithIndex
              .groupBy(_._1._3)
              .map { case (lbl, g) => (lbl, g.length.toLong, g.map(_._2 + 1).min) }
            val (lbl, n, best) = votes.toSeq
              .sortBy { case (l, n, b) => (-n, b, l) }.head
            Iterator.single((qid, lbl, n, best))
          }
      }
      .toDF("qid", "pred_label", "votes", "best_rank")
  }

  /**
   * Streaming exact-substring scrub against a STATIC reference corpus
   * — the online face of [[graft.ops.Dedup.exactSubstrDedup]] for the
   * incremental setting: any L-token window of an incoming doc whose
   * text already occurs in the reference is a duplicate; covered
   * tokens drop and the doc rebuilds from the survivors
   * (fully-covered docs vanish; output text is the normalized token
   * join, as in batch). Intra-STREAM duplication is NOT collapsed —
   * only duplication against the reference (the incremental contract,
   * like [[incrementalDedupStream]]).
   *
   * Scale shape, two legs (the bloom-prefilter pattern): reference
   * windows hash once at plan time into an 8-byte key relation
   * (persisted, [[graft.ops.CachedRelations]]-tracked) plus a bloom
   * sketch. Docs whose windows all miss the bloom pass through as a
   * ROW-LOCAL pure map — no join, no state. Only suspect docs explode
   * their windows into the stream-static join for EXACT confirmation
   * (bloom false positives route a doc to the join leg, never drop a
   * token), and rebuild per doc in flatMapGroupsWithState — all of a
   * doc's windows live in its own micro-batch, so the state slot is
   * vestigial like [[ivfLookupStream]]'s. The token array rides each
   * suspect window row through the join — the fan-out price of the
   * exact leg; the bloom keeps that leg at near-duplicate volume.
   */
  def exactSubstrScrubStream(stream: DataFrame, refDocs: DataFrame, idCol: String,
                             textCol: String, windowTokens: Int = 50,
                             expectedRefWindows: Long = 1000000L,
                             fpp: Double = 0.01): DataFrame = {
    import stream.sparkSession.implicits._
    graft.functions.Registry.ensure(stream.sparkSession)
    val refWins = refDocs.filter(col(textCol).isNotNull)
      .select(explode(call_function("word_grams", col(textCol),
        lit(windowTokens), lit(1))).as("w"))
      .select(xxhash64(col("w")).as("h")).distinct()
    val bloom = refWins.stat.bloomFilter("h", expectedRefWindows, fpp)
    val refStatic = graft.ops.CachedRelations.track(refWins.persist())
    val base = stream.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        call_function("word_grams", col(textCol), lit(1), lit(1)).as("_toks"),
        call_function("word_grams", col(textCol), lit(windowTokens), lit(1)).as("_wins"))
      .withColumn("_suspect",
        exists(col("_wins"), w => graft.functions.Registry.bloomColumn(xxhash64(w), bloom)))
    val clean = base.filter(!col("_suspect"))
      .select(col("id"), array_join(col("_toks"), " ").as("clean_text"),
        size(col("_toks")).cast("long").as("n_kept"), lit(0L).as("n_dropped"))
      .toDF("id", "clean_text", "n_kept", "n_dropped")
    val scrubbed = base.filter(col("_suspect"))
      .select(col("id"), col("_toks"), posexplode(col("_wins")).as(Seq("pos0", "w")))
      .select(col("id"), col("_toks"), (col("pos0") + 1).as("pos"),
        xxhash64(col("w")).as("h"))
      .join(refStatic.withColumnRenamed("h", "h2"), col("h") === col("h2"), "left")
      .select(col("id"), col("_toks"), col("pos"), col("h2").isNotNull.as("dup"))
      .as[(Long, Seq[String], Int, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, Seq[String], Int, Boolean)],
         state: GroupState[Boolean]) =>
          val rs = rows.toArray
          val toks = rs.head._2
          val covered = new Array[Boolean](toks.length)
          rs.foreach { case (_, _, pos, dup) =>
            if (dup) {
              var i = pos - 1
              val end = math.min(pos - 1 + windowTokens, toks.length)
              while (i < end) { covered(i) = true; i += 1 }
            }
          }
          val kept = toks.indices.filterNot(covered)
          if (kept.isEmpty) Iterator.empty
          else Iterator.single((id, kept.map(toks).mkString(" "),
            kept.size.toLong, (toks.length - kept.size).toLong))
      }
      .toDF("id", "clean_text", "n_kept", "n_dropped")
    clean.unionByName(scrubbed).withColumnRenamed("id", idCol)
  }

  /**
   * Streaming DSIR scoring — the online face of
   * [[graft.ops.Dsir.importanceWeights]]: each incoming doc gets its
   * log importance weight against a STATIC raw/target pair. The
   * Laplace log-ratio table (≤ `buckets` rows) is computed once at
   * plan time from the static corpora and rides the stream as a
   * LITERAL map, so scoring is a pure row-local map — no state, no
   * watermark, no join, composes with any downstream stateful stage
   * (the [[boilerplateFilterStream]] literal-inlining shape). A gram
   * hashing to a bucket neither static corpus touched scores the
   * closed-form unseen-bucket ratio ln(Cr+B)−ln(Ct+B).
   *
   * The per-row HOF lambda is interpreted (CodegenFallback) — fine at
   * stream rates; the BATCH path stays on the exploded/broadcast plan
   * which is why the two faces share the bucket hash but not the plan.
   */
  def dsirScoreStream(stream: DataFrame, raw: DataFrame, target: DataFrame,
                      idCol: String, textCol: String,
                      buckets: Int = 8192): DataFrame = {
    graft.functions.Registry.ensure(stream.sparkSession)
    val lrRows = graft.ops.Dsir.logRatioTable(raw, target, idCol, textCol, buckets)
    val rows = lrRows.collect() // bounded: at most `buckets` rows
    require(rows.nonEmpty, "dsirScoreStream: empty static corpora")
    val bs = rows.map(_.getLong(0))
    val ws = rows.map(_.getLong(1))
    val unseenMicro = graft.ops.Dsir.unseenBucketMicro(raw, target, idCol, textCol, buckets)
    val lrMap = map_from_arrays(typedLit(bs), typedLit(ws))
    val grams = concat(
      call_function("word_grams", col(textCol), lit(1), lit(1)),
      call_function("word_grams", col(textCol), lit(2), lit(1)))
    stream.filter(col(textCol).isNotNull)
      .withColumn("_grams", grams)
      .withColumn("n_grams", size(col("_grams")).cast("long"))
      .withColumn("logw_micro", aggregate(
        transform(col("_grams"), g =>
          coalesce(element_at(lrMap, pmod(xxhash64(g), lit(buckets.toLong))),
            lit(unseenMicro))),
        lit(0L), (acc, x) => acc + x))
      .withColumn("logw", col("logw_micro").cast("double") / lit(1e6))
      .drop("_grams")
  }

  /**
   * Streaming seasonal-load ratio — the online face of
   * [[graft.ops.Funnels.seasonalAnomalies]]: hourly windowed counts
   * per type, each scored against a STATIC weekday-hour baseline
   * (mean_micro per (event_type, dow, hour), typically the batch
   * operator's output) as ratio_micro = n·10¹² div mean_micro
   * (integral — n in micros over the baseline mean). The baseline
   * joins BEFORE the windowed aggregation (stream-static broadcast,
   * stateless), which keeps the plan inside Structured Streaming's
   * supported stream-static-join-then-aggregate shape; state is the
   * watermarked window store only. Unknown slots ratio NULL (no
   * baseline is different from "on baseline").
   */
  def seasonalRatioStream(events: DataFrame, baseline: DataFrame,
                          watermark: String = "2 hours"): DataFrame = {
    val e = events
      .withColumn("dow", dayofweek(col("ts")))
      .withColumn("hour", hour(col("ts")))
      .join(broadcast(baseline), Seq("event_type", "dow", "hour"), "left")
    e.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("mean_micro")).as("mean_micro"))
      .withColumn("ratio_micro",
        when(col("mean_micro").isNotNull && col("mean_micro") > 0,
          expr("n * 1000000000000 div mean_micro")))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("mean_micro"), col("ratio_micro"))
  }

  case class HeavyHitterOut(window_start: java.sql.Timestamp, token: String,
                            est_count: Long)

  /**
   * Streaming heavy hitters (trending tokens) per tumbling window —
   * the online face of [[graft.ops.TextAnalysis.heavyHitters]]: a
   * Misra–Gries summary of `kInv` counters lives in
   * flatMapGroupsWithState keyed by WINDOW START, so state per window
   * is O(kInv) regardless of token volume, and any token with true
   * count > N_window/(kInv+1) is guaranteed present (the batch
   * operator's sketch guarantee; the estimate is a lower bound that
   * undercounts by at most the total decrement). Every trigger emits
   * the window's current counters ≥ `minEst` (Update-mode
   * semantics — downstream keeps the latest row per (window, token)).
   * Pair with a state TTL in deployments; here windows accumulate
   * until the query stops.
   */
  def heavyHittersStream(docs: DataFrame, textCol: String, tsCol: String,
                         windowDuration: String = "1 hour", kInv: Int = 10,
                         minEst: Long = 1L): Dataset[HeavyHitterOut] = {
    import docs.sparkSession.implicits._
    val toks = docs
      .select(window(col(tsCol), windowDuration)("start").as("win"),
        explode(graft.ops.TextAnalysis.tokens(col(textCol))).as("tok"))
      .as[(java.sql.Timestamp, String)]
    toks.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], HeavyHitterOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (win: java.sql.Timestamp, rows: Iterator[(java.sql.Timestamp, String)],
         state: GroupState[Map[String, Long]]) =>
          var counters = state.getOption.getOrElse(Map.empty[String, Long])
          rows.foreach { case (_, t) =>
            counters.get(t) match {
              case Some(c) => counters = counters.updated(t, c + 1)
              case None if counters.size < kInv => counters = counters.updated(t, 1L)
              case None =>
                // decrement-all: drop zeroed counters (classic MG step)
                counters = counters.flatMap { case (k, c) =>
                  if (c > 1) Some(k -> (c - 1)) else None
                }
            }
          }
          state.update(counters)
          counters.toSeq.filter(_._2 >= minEst).sortBy { case (t, c) => (-c, t) }
            .map { case (t, c) => HeavyHitterOut(win, t, c) }.iterator
      }
  }

  case class RfmState(last_epoch: Long, frequency: Long, monetary_micro: Long)
  case class RfmScore(user_id: Long, recency_days: Long, frequency: Long,
                      monetary: Double, r_score: Int, f_score: Int, m_score: Int,
                      segment: String)

  /**
   * Streaming face of [[graft.ops.Rfm.rfm]]: per-user carried
   * (last-seen epoch, frequency, monetary) state via
   * mapGroupsWithState, re-scored and emitted on every update. A
   * stream has no "corpus max timestamp", so recency is measured
   * against the caller's `asOfEpoch` reference (re-launch to move it —
   * scores stay rerun-deterministic, the batch operator's property).
   * Monetary accumulates in integer micros with the same half-up
   * quantization as the batch DECIMAL cast, so a user's streamed score
   * equals the batch score over the same events (spec-pinned).
   * Deployments should add a GroupStateTimeout for idle users; state
   * is 24 bytes per user here.
   */
  def rfmStream(events: Dataset[UserEvent], asOfEpoch: Long,
                recencyDayBands: (Int, Int) = (2, 7),
                freqBands: (Long, Long) = (20L, 5L),
                monetaryBands: (BigDecimal, BigDecimal) = (BigDecimal(500), BigDecimal(100))): Dataset[RfmScore] = {
    import events.sparkSession.implicits._
    val mHi = (monetaryBands._1 * 1000000).toLongExact
    val mLo = (monetaryBands._2 * 1000000).toLongExact
    events.groupByKey(_.user_id)
      .mapGroupsWithState[RfmState, RfmScore](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[RfmState]) =>
          val next = batch.foldLeft(state.getOption.getOrElse(RfmState(Long.MinValue, 0L, 0L))) {
            (acc, e) =>
              val micro = BigDecimal(e.value)
                .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
                .*(BigDecimal(10000)).toLongExact * 100L // 4dp quantize -> micros
              RfmState(math.max(acc.last_epoch, e.ts.getTime / 1000L),
                acc.frequency + 1, acc.monetary_micro + micro)
          }
          state.update(next)
          val recencyDays = Math.floorDiv(asOfEpoch - next.last_epoch, 86400L)
          val r = if (recencyDays <= recencyDayBands._1) 3
            else if (recencyDays <= recencyDayBands._2) 2 else 1
          val f = if (next.frequency >= freqBands._1) 3
            else if (next.frequency >= freqBands._2) 2 else 1
          val m = if (next.monetary_micro >= mHi) 3
            else if (next.monetary_micro >= mLo) 2 else 1
          val segment =
            if (r == 3 && f == 3 && m == 3) "champion"
            else if (r >= 2 && f >= 2) "loyal"
            else if (r == 1 && f >= 2) "at_risk"
            else if (r >= 2 && f == 1) "new_or_casual"
            else "hibernating"
          RfmScore(uid, recencyDays, next.frequency,
            next.monetary_micro.toDouble / 1e6, r, f, m, segment)
      }
  }

  case class KmvGroupSketch(group: String, n_sketch: Int, est_distinct: Long)

  /**
   * Streaming face of [[graft.ops.Sketches.kmvSketch]]: per-group KMV
   * state (the k smallest value hashes seen so far) maintained in
   * flatMapGroupsWithState and re-estimated on every update — the
   * incremental form of the batch sketch, and the property that makes
   * KMV the right streaming summary: merging a batch into the state
   * is just "k smallest of the union", so the streamed sketch equals
   * the batch sketch over the same prefix (spec-pinned). State is
   * ≤ k longs per group (the 52-bit hex-prefix values the batch
   * estimator uses), never the values themselves.
   */
  def kmvSketchStream(df: DataFrame, groupCol: String, valueCol: String,
                      k: Int = 256): Dataset[KmvGroupSketch] = {
    import df.sparkSession.implicits._
    require(k >= 2)
    val hashed = df.filter(col(valueCol).isNotNull) // match the batch op
      .select(col(groupCol).cast("string").as("g"),
      // the batch op's hash: lowercase 16-hex xxhash64; keep the
      // 52-bit prefix as a long (order-preserving, estimator-ready)
      conv(substring(lower(lpad(hex(xxhash64(col(valueCol).cast("string"))), 16, "0")),
        1, 13), 16, 10).cast("long").as("h"))
      .as[(String, Long)]
    hashed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], KmvGroupSketch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val merged = (state.getOption.getOrElse(Array.empty[Long]) ++
            rows.map(_._2)).distinct.sorted.take(k)
          state.update(merged)
          val est =
            if (merged.length < k) merged.length.toLong
            else math.floor((k - 1).toDouble * 4503599627370496.0 /
              math.max(merged.last, 1L)).toLong
          Iterator.single(KmvGroupSketch(g, merged.length, est))
      }
  }

  /** Output-mode helper for tests/callers. */
  def updateMode: OutputMode = OutputMode.Update()
}
