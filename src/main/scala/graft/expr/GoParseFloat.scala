package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Go `strconv.ParseFloat` (ErrRange-as-null) over a string column as a
 * native Catalyst expression — delegates to
 * [[graft.functions.GoFloatParse.parse]]; see that object's scaladoc
 * for the parity contract and why the equivalent Column tree broke
 * whole-stage codegen. Registered as SQL function `go_parse_float` by
 * [[graft.functions.Registry]].
 *
 * NOT null-safe-eval: a NON-null input can still produce a null result
 * (unparseable), so nullable is unconditionally true and eval/codegen
 * handle the null result themselves.
 */
case class GoParseFloat(child: Expression) extends UnaryExpression {

  // input must already be StringType; callers cast explicitly
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else graft.functions.GoFloatParse.parse(v.asInstanceOf[UTF8String]) match {
      case null => null
      case d => d.doubleValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("goParsed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double $boxed = graft.functions.GoFloatParse.parse(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): GoParseFloat =
    copy(child = newChild)

  override def prettyName: String = "go_parse_float"
}
