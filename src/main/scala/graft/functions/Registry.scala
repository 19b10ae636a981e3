package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{GoFormatFloat, LshBuckets, MinhashSigX64, RollingFpX64, VecDot, WinnowFpX64, WordGramHashes}

/** Registers graft's native Catalyst expressions as SQL functions on a
  * session (callable via `call_function`/`expr`). Idempotent. */
object Registry {

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  def ensure(spark: SparkSession): Unit = {
    val key = System.identityHashCode(spark).toString
    if (!registered.add(key)) return
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1)))
    reg.registerFunction(
      FunctionIdentifier("go_format_float"),
      new ExpressionInfo(classOf[GoFormatFloat].getName, "go_format_float"),
      (children: Seq[Expression]) => GoFormatFloat(children.head))
    reg.registerFunction(
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        LshBuckets(children(0), asInt(children(1)), asInt(children(2)), asInt(children(3)))
      })
    reg.registerFunction(
      FunctionIdentifier("minhash_sig_x64"),
      new ExpressionInfo(classOf[MinhashSigX64].getName, "minhash_sig_x64"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        MinhashSigX64(children(0), asInt(children(1)), asInt(children(2)))
      })
    reg.registerFunction(
      FunctionIdentifier("rolling_fp_x64"),
      new ExpressionInfo(classOf[RollingFpX64].getName, "rolling_fp_x64"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        RollingFpX64(children(0), asInt(children(1)), asInt(children(2)))
      })
    reg.registerFunction(
      FunctionIdentifier("winnow_fp_x64"),
      new ExpressionInfo(classOf[WinnowFpX64].getName, "winnow_fp_x64"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        WinnowFpX64(children(0), asInt(children(1)), asInt(children(2)))
      })
    reg.registerFunction(
      FunctionIdentifier("word_gram_hashes"),
      new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
      (children: Seq[Expression]) => {
        def asInt(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue
        WordGramHashes(children(0), asInt(children(1)))
      })
  }

  /** Registers a one-off membership function for a concrete bloom
    * sketch (runtime object — can't be a name-only registration) and
    * returns its unique name for `call_function`. */
  def bloomFunction(spark: SparkSession,
                    bloom: org.apache.spark.util.sketch.BloomFilter): String = {
    val fnName = "graft_bloom_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName),
      new ExpressionInfo(classOf[graft.expr.BloomMightContain].getName, fnName),
      (children: Seq[Expression]) => graft.expr.BloomMightContain(children.head, bloom))
    fnName
  }
}
