package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Registry for persisted STAGE relations created inside operators
 * (the LSH index in [[Similarity.lshTopK]], the exact-dedup stage
 * boundary in [[Corpus.clean]]).
 *
 * An operator that persists internally can't unpersist before
 * returning — its result DataFrame is lazy and the cached relation is
 * exactly what makes the eventual action cheap. But persisting with NO
 * release path leaks the relation for the session's lifetime: every
 * call pins another chunk of executor storage memory (the same class
 * of leak as registering a UUID-named function per call). So operators
 * `track` what they persist, and the CALLER — who knows when the
 * action has run — calls [[releaseAll]] afterwards. Verify and Bench
 * release after every query; long-lived applications should release at
 * their own stage boundaries.
 */
object CachedRelations {
  private val active = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register an operator-persisted relation for later release. */
  def track(df: DataFrame): DataFrame = { active.add(df); df }

  /** Unpersist (non-blocking) every tracked relation; returns how many
    * were released. Safe to call with actions still pending — Spark
    * just recomputes — but intended for after the caller's action. */
  def releaseAll(): Int = {
    var n = 0
    var d = active.poll()
    while (d != null) { d.unpersist(blocking = false); n += 1; d = active.poll() }
    n
  }
}
