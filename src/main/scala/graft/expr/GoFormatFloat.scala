package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Go `strconv.FormatFloat(v,'g',-1,64)` rendering as a native Catalyst
 * expression (delegates to [[graft.functions.GoFloatFormat.format]]).
 *
 * This was the last Scala UDF on a hot path: every CSV/XML sink value
 * and every hash/dedup canonical string renders floats Go-style
 * (reference internal/io/csv.go:253, internal/transform/
 * transform.go:585-590). As a UDF it sat outside whole-stage codegen
 * with per-row boxing + encoder conversion; as an expression the
 * generated code calls the static formatter directly and the
 * surrounding projection stays in one codegen span. Registered as SQL
 * function `go_format_float` by [[graft.functions.Registry]].
 */
case class GoFormatFloat(child: Expression) extends UnaryExpression {

  // input must already be DoubleType (AbstractDataType needed for
  // ExpectsInputTypes is private[sql]); callers cast explicitly
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.functions.GoFloatFormat.format(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GoFloatFormat.format($c))")

  override protected def withNewChildInternal(newChild: Expression): GoFormatFloat =
    copy(child = newChild)

  override def prettyName: String = "go_format_float"
}
