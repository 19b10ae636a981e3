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

/**
 * Membership probe of a 64-bit hash against a SERIALIZED bloom sketch
 * carried in a BINARY column — the row-varying counterpart of
 * [[BloomMightContain]] (whose sketch is one plan-constant object).
 * This is what a per-file data-skipping INDEX needs: each index row
 * carries its own file's sketch, so the probe deserializes the row's
 * bytes and tests the hash. Deserialization cost is one
 * `BloomFilter.readFrom` per INDEX row per lookup — index relations
 * are metadata-scale (one row per data file), never corpus-scale, so
 * the probe never sits on a per-record hot path.
 *
 * Spark's own `BloomFilterMightContain` cannot express this: it
 * requires its bloom side to be foldable or a scalar subquery
 * (deserialized once), by design for row-level runtime filters.
 */
case class BloomBytesMightContain(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // left = serialized sketch (BINARY), right = 64-bit hash (LONG)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bytes: Any, h: Any): Any =
    graft.functions.BloomProbe.mightContain(
      bytes.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.BloomProbe.mightContain($b, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBytesMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_bytes_might_contain"
}
