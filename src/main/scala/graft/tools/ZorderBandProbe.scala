package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dispersion instrument for q_zorder_pruning (r15 verdict ask 4): the
 * row's committed close recordings spread 2.0–3.6 s across exclusive
 * runs every round — the widest relative band of any multi-second row.
 * The query is PURE DataFrame compute (no filesystem listing anywhere
 * on its path — the suspected `listFiles(recursive)` does not appear;
 * [[graft.ops.Layout.pruningReport]] builds bounds aggregates, two
 * [[graft.ops.Cumulative.runningSums]] file assignments, and two
 * per-file rollups), so the instrument separates:
 *
 *  - WITHIN-JVM pass dispersion (8 passes, same session): GC/stage-
 *    scheduling noise inherent to the ~30-stage shape;
 *  - component legs (zorder assignment vs linear assignment vs the
 *    full report): which leg carries the band.
 *
 * Usage: ZorderBandProbe [sfDir] [passes]
 */
object ZorderBandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import org.apache.spark.sql.functions.col
    def li = graft.queries.Queries.t(spark, dir, "lineitem")
    def time(fn: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn.write.format("noop").mode("overwrite").save()
      finally graft.ops.CachedRelations.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    def leg(name: String)(fn: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (0 until passes).map(_ => time(fn))
      println(f"[zband] $name%-18s " + ts.map(t => f"$t%.2f").mkString(" ") +
        f"  min=${ts.min}%.2f max=${ts.max}%.2f maxmin=${ts.max / ts.min}%.2f")
    }
    leg("full_report") {
      graft.ops.Layout.pruningReport(li, Seq("l_partkey", "l_suppkey"),
        Seq("l_orderkey", "l_linenumber"),
        Seq(("l_partkey", 400.0, 700.0), ("l_suppkey", 20.0, 40.0)),
        bits = 16, nFiles = 64)
    }
    leg("zorder_assign") {
      graft.ops.Layout.fileAssignment(
        graft.ops.Layout.zorderValue(li, Seq("l_partkey", "l_suppkey"), 16),
        Seq("zval"),
        Seq("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"), 64)
        .groupBy(col("file_id")).count()
    }
    leg("linear_assign") {
      graft.ops.Layout.fileAssignment(li, Seq("l_partkey"),
        Seq("l_suppkey", "l_orderkey", "l_linenumber"), 64)
        .groupBy(col("file_id")).count()
    }
    spark.stop()
  }
}
