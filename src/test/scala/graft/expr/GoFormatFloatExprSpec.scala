package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The codegen'd go_format_float expression: value parity with the
  * driver-side formatter, null safety, and codegen survival. */
class GoFormatFloatExprSpec extends SparkTestBase {

  test("expression matches GoFloatFormat.format and keeps nulls") {
    import spark.implicits._
    val in = Seq[java.lang.Double](
      0.0, -0.0, 1.0, 1.5, 2000000.0, 1234567.0, 0.00001, 1.23e22,
      6.02e-23, Double.NaN, Double.PositiveInfinity, null)
    val df = in.toDF("d")
    val got = graft.functions.GoFloatFormat.goFormat(col("d").cast("double"))
    val rows = df.select(col("d"), got.as("s")).collect()
    rows.foreach { r =>
      val d = r.get(0).asInstanceOf[java.lang.Double]
      val want = if (d == null) null else graft.functions.GoFloatFormat.format(d)
      assert(r.getString(1) == want, s"for $d")
    }
  }

  test("plan stays inside whole-stage codegen (no ScalaUDF node)") {
    // spark.range, not a local Seq: ConvertToLocalRelation folds a
    // literal-backed projection at optimize time, leaving no codegen
    // stage to inspect at all.
    val df = spark.range(4)
      .select(graft.functions.GoFloatFormat.goFormat(col("id").cast("double") / 2).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    val codegen = df.queryExecution.debug.codegenToSeq()
    assert(codegen.nonEmpty && codegen.head._2.contains("GoFloatFormat.format"),
      "generated code should call the static formatter")
  }
}
