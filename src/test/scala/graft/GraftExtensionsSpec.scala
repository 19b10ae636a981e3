package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The SparkSessionExtensions deployment path: a session built with the
 * [[GraftExtensions]] injector (no Registry.ensure call) can invoke
 * graft's native expressions from plain SQL. `withExtensions` applies
 * the same injector `spark.sql.extensions=graft.GraftExtensions` would
 * on a fresh cluster — the config-string route needs a new
 * SparkContext, which the shared test context can't provide. Tests run
 * sequentially in one forked JVM, so swapping the default session and
 * restoring it afterwards is safe.
 */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) session resolves vec_dot / go_format_float / lsh_buckets in SQL") {
    val prior = SparkTestSession.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()

      val dot = s.sql(
        "SELECT vec_dot(CAST(array(1.0, 2.0, 3.0) AS array<double>), " +
          "CAST(array(4.0, 5.0, 6.0) AS array<double>)) AS d")
        .head().getDouble(0)
      assert(dot == 32.0)

      val fmt = s.sql("SELECT go_format_float(CAST(0.1 AS double)) AS f")
        .head().getString(0)
      assert(fmt == "0.1")

      // same plan-time sign matrix as the expression used via the API,
      // so buckets must agree with a direct LshBuckets column
      val viaSql = s.sql(
        "SELECT lsh_buckets(CAST(array(0.5, -0.25, 1.5, 2.0) AS array<double>), 4, 6, 2) AS b")
        .head().getSeq[Long](0)
      val viaApi = {
        import org.apache.spark.sql.functions._
        graft.functions.Registry.ensure(prior)
        prior.range(1).select(call_function("lsh_buckets",
            expr("CAST(array(0.5, -0.25, 1.5, 2.0) AS array<double>)"),
            lit(4), lit(6), lit(2)).as("b"))
          .head().getSeq[Long](0)
      }
      assert(viaSql == viaApi)
      assert(viaSql.length == 2)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
