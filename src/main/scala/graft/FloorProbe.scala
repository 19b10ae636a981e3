package graft
import org.apache.spark.sql.SparkSession

/**
 * Tail-floor decomposition probe (optimization guide §1): for each
 * named query, separates the warm per-execution cost into
 *   build   — fn() DataFrame construction + Catalyst analysis
 *   plan    — optimization + physical planning (+ codegen lookup)
 *   exec    — the noop-sink run itself
 * by timing each phase explicitly on a bench-shaped session
 * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, codegen cache
 * sized like Bench). Warmed twice before the 3 measured repetitions;
 * min reported. Diagnostic only — never part of the driver contract.
 */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // two full warmups
      (0 until 2).foreach { _ =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        finally graft.ops.CachedRelations.releaseAll()
      }
      var bBuild, bPlan, bExec, bTotal = Double.MaxValue
      (0 until 3).foreach { _ =>
        val tA = System.nanoTime()
        val df = fn(spark, sfDir)
        val build = ms(tA)
        val tB = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val plan = ms(tB)
        val tC = System.nanoTime()
        try df.write.format("noop").mode("overwrite").save()
        finally graft.ops.CachedRelations.releaseAll()
        val exec = ms(tC)
        bBuild = math.min(bBuild, build); bPlan = math.min(bPlan, plan)
        bExec = math.min(bExec, exec); bTotal = math.min(bTotal, ms(tA))
      }
      println(f"FLOOR $name%-36s build=$bBuild%8.1f ms  plan=$bPlan%8.1f ms  exec=$bExec%8.1f ms  total=$bTotal%8.1f ms")
    }
    spark.stop()
  }
}
