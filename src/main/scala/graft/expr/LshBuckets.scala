package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * All `tables` random-hyperplane LSH bucket keys of an array<double>
 * vector in ONE native expression: returns array<long> of length
 * `tables`, where bit j of element t is the sign of hyperplane
 * (t*planes+j) dotted with the vector.
 *
 * Why an expression instead of composed builtins: the unrolled column
 * formula is tables × planes × dims flat terms (4×6×64 ≈ 1.5k
 * element_at nodes) — Janino spends seconds compiling it and every
 * term is a virtual call. Here the sign matrix is precomputed ONCE at
 * plan time (same xxhash64 derivation as [[graft.ops.Similarity]]'s
 * planeSign, so buckets are identical) and the generated code is one
 * static call into a tight primitive loop. Registered as SQL function
 * `lsh_buckets(vec, dims, planes, tables)` by
 * [[graft.functions.Registry]].
 */
case class LshBuckets(child: Expression, dims: Int, planes: Int, tables: Int)
    extends UnaryExpression {

  // input must already be array<double> (AbstractDataType needed for
  // ExpectsInputTypes is private[sql]); callers cast explicitly
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** ±1 per (table, plane, dim), flat [((t*planes)+j)*dims + i]. */
  @transient private lazy val signs: Array[Double] =
    LshBuckets.signMatrix(dims, planes, tables)

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], signs, dims, planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.LshBuckets.compute($c, $signsRef, $dims, $planes, $tables);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {

  /** Deterministic sign matrix — exactly Similarity.planeSign's
    * xxhash64(planeIndex, dim) parity, evaluated once on the driver. */
  def signMatrix(dims: Int, planes: Int, tables: Int): Array[Double] = {
    val out = new Array[Double](tables * planes * dims)
    var t = 0
    while (t < tables) {
      var j = 0
      while (j < planes) {
        val plane = t * planes + j
        var i = 0
        while (i < dims) {
          val h = XxHash64(Seq(Literal(plane), Literal(i)), 42L).eval(null).asInstanceOf[Long]
          out((t * planes + j) * dims + i) = if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
          i += 1
        }
        j += 1
      }
      t += 1
    }
    out
  }

  /** Tight primitive loop shared by interpreted eval and codegen. */
  def compute(v: ArrayData, signs: Array[Double], dims: Int,
              planes: Int, tables: Int): ArrayData = {
    val n = math.min(dims, v.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var j = 0
      while (j < planes) {
        val off = (t * planes + j) * dims
        var d = 0.0
        var i = 0
        while (i < n) { d += v.getDouble(i) * signs(off + i); i += 1 }
        if (d > 0) b |= (1L << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}
