package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed parquet tables — the shuffle-elimination layout for
 * RECURRING joins and aggregations at 100 TB. A table bucketed on its
 * join key with N buckets is physically pre-partitioned by
 * hash(key) % N at WRITE time; when both sides of a join are bucketed
 * on the key with the same bucket count, Spark's sort-merge join runs
 * with ZERO Exchange — the single biggest cost in a fact-fact join —
 * and a groupBy on the bucket key likewise skips its shuffle. Paying
 * one clustering write once and skipping the shuffle on every
 * subsequent read is the right trade exactly when the join/agg key is
 * stable and the table is read many times (the fact-table norm).
 *
 * `sortCols` adds in-bucket ordering (typically the join key), which
 * also removes the per-task Sort from the merge join.
 *
 * Spark exposes bucketing only through the table catalog
 * (`saveAsTable`), not raw-path writes; `path` makes the table
 * EXTERNAL so the data lives where the caller says and survives a
 * catalog drop.
 */
object Bucketed {

  def writeTable(df: DataFrame, tableName: String, path: String,
                 bucketKeys: Seq[String], buckets: Int,
                 sortCols: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty && buckets >= 1)
    val w0 = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(tableName)
  }

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
