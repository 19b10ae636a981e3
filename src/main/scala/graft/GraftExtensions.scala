package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{GoFormatFloat, LshBuckets, MinhashSigX64, RollingFpX64, VecDot, WinnowFpX64, WordGramHashes}

/**
 * SparkSessionExtensions injector: activate graft's native expressions
 * cluster-wide with
 *   spark.sql.extensions=graft.GraftExtensions
 * (no code changes in the consuming job — the standard way to ship a
 * Catalyst extension library). `graft.functions.Registry.ensure` is
 * the equivalent runtime-registration path for embedded use.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("go_format_float"),
      new ExpressionInfo(classOf[GoFormatFloat].getName, "go_format_float"),
      (children: Seq[Expression]) => GoFormatFloat(children.head)))
    ext.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        LshBuckets(children(0), asInt(children(1)), asInt(children(2)), asInt(children(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig_x64"),
      new ExpressionInfo(classOf[MinhashSigX64].getName, "minhash_sig_x64"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        MinhashSigX64(children(0), asInt(children(1)), asInt(children(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_fp_x64"),
      new ExpressionInfo(classOf[RollingFpX64].getName, "rolling_fp_x64"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        RollingFpX64(children(0), asInt(children(1)), asInt(children(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fp_x64"),
      new ExpressionInfo(classOf[WinnowFpX64].getName, "winnow_fp_x64"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        WinnowFpX64(children(0), asInt(children(1)), asInt(children(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_gram_hashes"),
      new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        WordGramHashes(children(0), asInt(children(1)))
      }))
  }
}
