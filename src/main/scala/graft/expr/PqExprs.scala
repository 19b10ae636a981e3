package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Product-quantization kernels for [[graft.ops.Similarity.ivfPqTopK]].
 *
 * Why expressions instead of composed builtins: the unrolled encode
 * argmin is m x ksub struct terms each containing an array literal and
 * a dot (8x16 = 128 terms at the default config, 512 at ksub=32) —
 * past janino's 64 KB method limit the whole projection silently (or
 * with ksub=32, fatally) leaves whole-stage codegen. Here the codebook
 * is a plan-time reference object and each kernel is one static call
 * into a tight primitive loop (the [[LshBuckets]] pattern).
 *
 * Codebooks are driver-computed runtime values, so they ride the
 * function-builder as evaluated array literals (see
 * [[graft.functions.Registry]]), not as generated code.
 */
object PqExprs {

  /** argmin codes: for each subspace j, the index c minimizing
    * |x_j - books[j][c]|^2, first index winning ties. */
  def encode(v: ArrayData, books: Array[Double], m: Int, ksub: Int): ArrayData = {
    val sd = books.length / (m * ksub)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * sd
        var d = 0.0
        var i = 0
        while (i < sd) {
          val t = v.getDouble(j * sd + i) - books(off + i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: full-precision query dotted with the
    * code-reconstructed candidate, summed over subspaces. */
  def adc(q: ArrayData, codes: ArrayData, books: Array[Double],
          m: Int, ksub: Int): Double = {
    val sd = books.length / (m * ksub)
    var acc = 0.0
    var j = 0
    while (j < m) {
      val off = (j * ksub + codes.getInt(j)) * sd
      var i = 0
      while (i < sd) {
        acc += q.getDouble(j * sd + i) * books(off + i)
        i += 1
      }
      j += 1
    }
    acc
  }

  /** Squared norm of the code-reconstructed vector: sum over subspaces
    * of the chosen centroid's squared norm (cn2 flat [j*ksub + c]). */
  def cn2(codes: ArrayData, cn2s: Array[Double], ksub: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.numElements()) {
      acc += cn2s(j * ksub + codes.getInt(j))
      j += 1
    }
    acc
  }
}

case class PqEncode(child: Expression, books: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PqExprs.encode(input.asInstanceOf[ArrayData], books, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.PqExprs.encode($c, $booksRef, $m, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

case class PqAdc(left: Expression, right: Expression, books: Array[Double],
                 m: Int, ksub: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    PqExprs.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], books, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.expr.PqExprs.adc($q, $c, $booksRef, $m, $ksub);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

case class PqCn2(child: Expression, cn2s: Array[Double], ksub: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(codes: Any): Any =
    PqExprs.cn2(codes.asInstanceOf[ArrayData], cn2s, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2s, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.PqExprs.cn2($c, $cn2Ref, $ksub);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCn2 =
    copy(child = newChild)

  override def prettyName: String = "pq_cn2"
}
