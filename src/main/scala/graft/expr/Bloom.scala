package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership probe of a 64-bit hash against a pre-built
 * [[org.apache.spark.util.sketch.BloomFilter]] (the sketch ships with
 * the plan as a reference object, exactly how Spark's own runtime
 * row-level filtering carries its bloom). True = POSSIBLY present
 * (callers must verify positives exactly); false = definitely absent.
 *
 * This powers [[graft.ops.Dedup.incrementalDedup]]'s prefilter: rows
 * that cannot be in the reference corpus skip the anti-join shuffle
 * entirely, so the exchange carries only probable duplicates.
 */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  // child must already be a LongType hash; callers hash explicitly
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
