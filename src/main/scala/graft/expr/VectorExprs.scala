package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native dot product over two array<double> columns.
 *
 * The builtin route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) runs
 * interpreted lambdas with per-element boxing — ~15us per 64-dim pair.
 * This expression is a tight codegen'd primitive loop (~100ns), which
 * is what embedding similarity needs when the candidate set is 10^9
 * pairs at 100 TB. Registered as SQL function `vec_dot` by
 * [[graft.functions.Registry]].
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be array<double> (AbstractDataType needed for
  // ExpectsInputTypes is private[sql]); callers cast explicitly
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/**
 * Native INTEGER dot product over two array<int> code columns — the
 * coarse-pass scorer for int8-quantized ANN ([[graft.ops.Similarity
 * .ivfTopKInt8]]): codes are in [-127, 127] so a 64-dim dot is at most
 * ~1e6, and the Long accumulator is exact to 2^63 (no FP at all in the
 * coarse pass — identical result in any engine and any partition
 * order). Registered as SQL function `vec_dot_i8`.
 */
case class VecDotInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getInt($i) * $b.getInt($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotInt8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_i8"
}

/**
 * Native agreement count over two MinHash/OPH signature columns
 * (array<bigint>): the number of positions with equal values, over
 * the shorter length (zip_with pads the shorter side with nulls,
 * which can never compare equal — identical semantics). The builtin
 * route (`aggregate(zip_with(a, b, when(_===_,1)))`) runs interpreted
 * per-element lambdas on EVERY candidate pair of every banded
 * near-dup path. Registered as SQL function `sig_agree_count`.
 */
case class SigAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreeCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sig_agree_count"
}

/**
 * Native Hamming distance over two sign-packed code columns
 * (array<bigint>): Σ popcount(x XOR y) — the binary-ANN coarse-pass
 * scorer ([[graft.ops.Similarity.binaryTopK]]), previously the
 * interpreted `aggregate(zip_with(bit_count(xor)))` per candidate
 * pair. Registered as SQL function `hamming_x64`.
 */
case class HammingX64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingX64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming_x64"
}
