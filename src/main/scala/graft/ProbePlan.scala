package graft
import org.apache.spark.sql.SparkSession
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      println(s"PLAN $n reused=${p.split("ReusedExchange").length - 1} " +
        s"exchanges=${p.split("Exchange").length - 1}")
    }
    spark.stop()
  }
}
