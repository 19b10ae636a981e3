package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.Cross

/**
 * Registry-wide plan-hygiene sweep (VERDICT r9 ask #4): compile EVERY
 * registered query against sf0.001 and assert the standing invariants
 * the per-operator specs established one at a time:
 *
 *  1. no partition-less Window — the class `ops/Cumulative` exists to
 *     eliminate (a bare `Window.orderBy` moves the WHOLE relation
 *     into one task; a foldable partition spec like `lit("all")`
 *     constant-folds into the same trap, which is why the check runs
 *     on the OPTIMIZED plan where only the surviving non-foldable
 *     expressions remain);
 *  2. no unbounded cartesian product — a Cross/condition-less join is
 *     only acceptable when one side carries an explicit broadcast
 *     hint (the documented one-row-bounds pattern: a 1-row aggregate
 *     broadcast against the corpus).
 *
 * The sweep inspects the optimized LOGICAL plan, so it costs one
 * analysis+optimization pass per query, not an execution — queries
 * whose CONSTRUCTION runs bounded driver-side fits (MLlib LR, sampled
 * codebooks, BPE merge loop) still run those, which at sf0.001 keeps
 * the sweep in test-suite budget.
 */
class PlanHygieneSweepSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Documented brute-force cosine baselines: their pair generator is
    * an intentional conditioned cross join (`cos(a,b) >= t, id_a <
    * id_b`) — the exact-oracle instantiation the scale paths (LSH /
    * IVF / banded) are verified against (see the "oracle baseline, not
    * a perf claim" scaladoc at each site). Everything else in the
    * registry must justify a cartesian with a broadcast hint or a
    * provably one-row side. */
  private val bruteForceBaselines = Set(
    "q_llm_cosine_neardup", "q_llm_pagerank_dups", "q_llm_triangles",
    "q_llm_link_pred")

  private def windowViolations(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: LWindow if w.partitionSpec.forall(_.foldable) =>
        s"partition-less Window (spec=${w.partitionSpec.mkString(",")})"
    }

  private def cartesianViolations(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case j: Join if j.condition.isEmpty || j.joinType == Cross =>
        val hinted = j.hint.leftHint.exists(_.strategy.isDefined) ||
          j.hint.rightHint.exists(_.strategy.isDefined)
        // a broadcast-hinted cross join is the documented one-row-bounds
        // pattern; a 1-row LocalRelation/aggregate side is equally bounded
        // even when the hint was folded away
        val oneRowSide = Seq(j.left, j.right).exists(side =>
          side.maxRows.exists(_ <= 1))
        if (hinted || oneRowSide) None
        else Some(s"unhinted cartesian join (${j.joinType})")
    }.flatten

  /** Queries allowed to carry an interpreted Scala UDF, each with the
    * reason the UDF is off the corpus-volume path:
    *  - bpe_fertility / bpe_merges-family: the iterative merge
    *    application runs on the DISTINCT-WORD relation
    *    (vocabulary-bounded), not per corpus row; the 1k-merge
    *    production path (`q_llm_bpe_encode_1k`) is the native
    *    expression instead.
    *  - the IVF ANN family: the two UDFs per plan are MLlib's
    *    `array_to_vector` boundary adapter — the mandatory input
    *    format for the KMeans codebook/cell fit on the ONE-TIME
    *    index-build path; the per-candidate scoring path is native
    *    codegen expressions (vec_dot / vec_dot_i8 / pq_adc).
    */
  // (r16: the IVF ANN family left this list entirely — the MLlib
  // array_to_vector fit adapter went with the MLlib fit; cell
  // assignment is the native pq_encode argmin, so those plans carry
  // no UDF at all.)
  private val udfAllowlist = Set("q_llm_bpe_fertility",
    // playbook result-twin of the row above: same delegated op, same
    // documented UDF (vocabulary-bounded merge application), the YAML
    // adds a parse, not a plan
    "q_playbook_bpe",
    // r12 equivalence oracle: the plan UNIONS the config path with its
    // twin above to compare them, so it carries the twins'
    // already-allowlisted UDF (and nothing else)
    "q_playbook_bpe_check",
    // r12 native-vs-iterative BPE equivalence: the iterative reference
    // encoder is deliberately a UDF, applied only to the DISTINCT-WORD
    // relation (vocabulary-bounded, same documented boundary as
    // q_llm_bpe_fertility)
    "q_llm_bpe_native_check",
    // unigram-LM family (r12): Viterbi segmentation is inherently
    // iterative per word and runs ONLY on the distinct-word relation —
    // the same vocabulary-bounded boundary as the BPE rows above
    // (playbook face + equivalence check carry the same UDF)
    "q_llm_unigram_fertility", "q_llm_unigram_check",
    "q_playbook_unigram", "q_playbook_unigram_check",
    // WordPiece family (r12): greedy longest-match inference is
    // inherently iterative per word and runs ONLY on the distinct-word
    // relation — the same vocabulary-bounded boundary as BPE/unigram
    // (playbook face + equivalence check carry the same UDF)
    "q_llm_wordpiece_fertility", "q_llm_wordpiece_check",
    "q_playbook_wordpiece", "q_playbook_wordpiece_check",
    // byte-level BPE family (r13): the fuse-loop encoder/round-trip is
    // inherently iterative per word and runs ONLY on the distinct-word
    // relation — the same vocabulary-bounded boundary as BPE/unigram/
    // WordPiece above
    "q_llm_bbpe_fertility", "q_llm_bbpe_check", "q_llm_bbpe_native_check",
    // r13 persisted-ANN equivalence checks: each plan carries the
    // IN-SESSION twin (already-allowlisted MLlib array_to_vector fit
    // adapter) alongside the loaded-index path purely to compare them
    "q_llm_ann_persist_check", "q_llm_ann_pq_persist_check")

  test("every registered query: no partition-less Window, no unhinted cartesian, no un-allowlisted UDF") {
    graft.functions.Registry.ensure(spark)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.queries.Queries.all.foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        val plan = df.queryExecution.optimizedPlan
        val cart =
          if (bruteForceBaselines(q.name)) Nil else cartesianViolations(plan)
        val udfs =
          if (udfAllowlist(q.name)) Nil
          else plan.collect { case p =>
            p.expressions.flatMap(_.collect {
              case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
                s"interpreted ScalaUDF ${u.udfName.getOrElse("<anon>")}"
            })
          }.flatten
        (windowViolations(plan) ++ cart ++ udfs).foreach { v =>
          failures += s"${q.name}: $v"
        }
      } catch {
        case e: Throwable =>
          failures += s"${q.name}: failed to compile plan: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString
      } finally CachedRelations.releaseAll()
    }
    assert(failures.isEmpty,
      s"\n${failures.size} plan-hygiene violations:\n  " + failures.mkString("\n  "))
  }
}
