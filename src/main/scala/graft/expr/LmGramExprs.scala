package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native n-gram/unit extraction for the LM operators
 * ([[graft.ops.TextAnalysis]]) — one tight loop over the token array
 * per document instead of the composed `zip_with`/`slice` struct
 * lambdas, which Catalyst evaluates INTERPRETED (higher-order
 * functions carry a per-element lambda closure; the r16 probe measured
 * the fused tagged-gram extraction at ~0.66 s/pass warm at sf0.1 where
 * the tokenize itself is 0.08 s). Outputs are value-identical struct
 * arrays over the SAME token-array input, so tokenization semantics
 * are untouched and the gram relations (and every oracled LM row
 * derived from them) are bit-exact. LmGramExprsSpec pins each
 * expression against its Column-algebra formulation on edge fixtures.
 */
object LmGramExprs {

  /** The produced arrays outlive the input row, whose UTF8Strings may
    * point into a reused buffer — clone every token we emit. Each
    * token is cloned ONCE and the reference shared across the grams
    * that contain it. */
  private def clonedToks(toks: ArrayData): Array[UTF8String] = {
    val n = toks.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      out(i) = if (s == null) null else s.clone()
      i += 1
    }
    out
  }

  private val kindT = UTF8String.fromString("t")
  private val kindB = UTF8String.fromString("b")
  private val kindU = UTF8String.fromString("u")

  val taggedType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("a", StringType, nullable = true),
    StructField("b", StringType, nullable = true),
    StructField("c", StringType, nullable = true))), containsNull = false)

  val mknUnitsType: DataType = ArrayType(StructType(Seq(
    StructField("u", StringType, nullable = true),
    StructField("v", StringType, nullable = true),
    StructField("w", StringType, nullable = true))), containsNull = false)

  val knUnitsType: DataType = ArrayType(StructType(Seq(
    StructField("prev", StringType, nullable = true),
    StructField("cur", StringType, nullable = true))), containsNull = false)

  /** (kind, a, b, c) tagged gram rows: trigrams (kind 't', when
    * `withTrigrams`), bigrams ('b'), unigrams ('u') — the
    * [[graft.ops.TextAnalysis.taggedGrams]] explode input. */
  def tagged(toksIn: ArrayData, withTrigrams: Boolean): ArrayData = {
    val toks = clonedToks(toksIn)
    val n = toks.length
    val n3 = if (withTrigrams) math.max(n - 2, 0) else 0
    val n2 = math.max(n - 1, 0)
    val out = new Array[Any](n3 + n2 + n)
    var o = 0
    var i = 0
    while (i < n3) {
      out(o) = new GenericInternalRow(Array[Any](kindT, toks(i), toks(i + 1), toks(i + 2)))
      o += 1; i += 1
    }
    i = 0
    while (i < n2) {
      out(o) = new GenericInternalRow(Array[Any](kindB, toks(i), toks(i + 1), null))
      o += 1; i += 1
    }
    i = 0
    while (i < n) {
      out(o) = new GenericInternalRow(Array[Any](kindU, toks(i), null, null))
      o += 1; i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc mkn scoring units ([[graft.ops.TextAnalysis.mknScoreUnits]]
    * explode input): position 1 as (null, null, tok1), position 2 as
    * (null, tok1, tok2) when present, positions ≥ 3 as the trigrams.
    * `withHeads = false` emits the trigrams alone (the Stupid-Backoff
    * per-doc triple relation). */
  def mknUnits(toksIn: ArrayData, withHeads: Boolean): ArrayData = {
    val toks = clonedToks(toksIn)
    val n = toks.length
    val n3 = math.max(n - 2, 0)
    val nh = if (!withHeads) 0 else if (n >= 2) 2 else 1
    val out = new Array[Any](nh + n3)
    var o = 0
    if (withHeads && n >= 1) {
      out(o) = new GenericInternalRow(Array[Any](null, null, toks(0)))
      o += 1
      if (n >= 2) {
        out(o) = new GenericInternalRow(Array[Any](null, toks(0), toks(1)))
        o += 1
      }
    }
    var i = 0
    while (i < n3) {
      out(o) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1), toks(i + 2)))
      o += 1; i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc bigram scoring units (kn2 / JM-bigram shape): position 1
    * as (null, tok1), transitions as (tok_i, tok_i+1). */
  def knUnits(toksIn: ArrayData): ArrayData = {
    val toks = clonedToks(toksIn)
    val n = toks.length
    val n2 = math.max(n - 1, 0)
    val out = new Array[Any](math.min(n, 1) + n2)
    var o = 0
    if (n >= 1) {
      out(o) = new GenericInternalRow(Array[Any](null, toks(0)))
      o += 1
    }
    var i = 0
    while (i < n2) {
      out(o) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1)))
      o += 1; i += 1
    }
    new GenericArrayData(out)
  }
}

/** `tagged_grams(toks, withTrigrams)` over array<string>. */
case class TaggedGramsExpr(child: Expression, withTrigrams: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LmGramExprs.taggedType
  override protected def nullSafeEval(input: Any): Any =
    LmGramExprs.tagged(input.asInstanceOf[ArrayData], withTrigrams)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.LmGramExprs.tagged($c, $withTrigrams);")
  override protected def withNewChildInternal(newChild: Expression): TaggedGramsExpr =
    copy(child = newChild)
  override def prettyName: String = "tagged_grams"
}

/** `mkn_units(toks, withHeads)` over array<string>. */
case class MknUnitsExpr(child: Expression, withHeads: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LmGramExprs.mknUnitsType
  override protected def nullSafeEval(input: Any): Any =
    LmGramExprs.mknUnits(input.asInstanceOf[ArrayData], withHeads)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.LmGramExprs.mknUnits($c, $withHeads);")
  override protected def withNewChildInternal(newChild: Expression): MknUnitsExpr =
    copy(child = newChild)
  override def prettyName: String = "mkn_units"
}

/** `kn_units(toks)` over array<string>. */
case class KnUnitsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LmGramExprs.knUnitsType
  override protected def nullSafeEval(input: Any): Any =
    LmGramExprs.knUnits(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.LmGramExprs.knUnits($c);")
  override protected def withNewChildInternal(newChild: Expression): KnUnitsExpr =
    copy(child = newChild)
  override def prettyName: String = "kn_units"
}
