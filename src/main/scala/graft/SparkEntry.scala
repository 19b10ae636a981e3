package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship pipeline on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises filter (govaluate-translated) → transform → dedup. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val pred = graft.expr.Goval.translate("l_quantity > 10 && l_returnflag != 'X'",
      stringTyped = Set("l_returnflag")).sql
    val li = spark.read.parquet(s"$dir/lineitem.parquet").filter(expr(pred))
    graft.ops.Dedup.byIngestOrder(li, Seq("l_orderkey"), keepFirst = true)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_returnflag"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
