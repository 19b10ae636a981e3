package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/**
 * Optimizer-visible EVALUATION BARRIER: value-transparent (eval and
 * codegen both delegate to the child verbatim) but REPORTED as
 * nondeterministic, so the optimizer may not duplicate the child —
 * `CollapseProject` will not merge a projection containing it into a
 * consumer, and predicate pushdown will not substitute it into a
 * filter below.
 *
 * WHY THIS EXISTS: Catalyst assumes re-evaluating a deterministic
 * expression is free and duplicates liberally — projection collapse
 * inlines a projected column's TREE into every consumer, and
 * `PushPredicateThroughNonJoin` substitutes it into pushed filters.
 * For codegen'd scalar expressions that is usually right. For an
 * EXPENSIVE INTERPRETED tree (higher-order-function lambdas are
 * CodegenFallback) it multiplies the dominant cost: the md5-portable
 * winnowing fixture's per-window lambda referenced its shingle-hash
 * array, and after collapse + an `InferFiltersFromGenerate` pushdown
 * the O(L·md5) hash construction re-ran PER WINDOW POSITION inside a
 * filter at the scan — O(L²) per doc per consumer, measured 196 s for
 * a 500-doc gate fixture (r16). One barrier around the projected
 * array restores evaluate-once semantics.
 *
 * The nondeterminism is a statement to the OPTIMIZER, not a fact
 * about the value: the child must itself be deterministic (the
 * barrier changes where an expression is evaluated, never what it
 * returns), so wrapping keeps oracle/hash-equality contracts intact.
 * Same discipline as the r15 streaming-UDF `asNondeterministic`
 * evaluation barrier, generalized to any Column.
 */
case class EvalBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalBarrier =
    copy(child = newChild)
  override def prettyName: String = "eval_barrier"
}
