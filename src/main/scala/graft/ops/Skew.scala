package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling for hot keys.
 *
 * At 100 TB a groupBy on a key with a few dominant values (one user,
 * one boilerplate document) puts an entire key on one reducer. Salting
 * splits each key into `buckets` sub-keys, aggregates partially per
 * sub-key (parallel across reducers), then merges the partials in a
 * second, tiny aggregation. AQE's skew-join handling covers JOINS
 * automatically; salting is the aggregation-side counterpart.
 */
object Skew {

  /**
   * Join/group-key skew diagnostic — the report that tells you
   * WHETHER to reach for [[saltedAgg]]/[[saltedJoin]] before a 100 TB
   * run: per-key counts bucketed by bit length (log2-spaced,
   * integer-exact), with key counts and row mass per bucket. A
   * healthy key is a low bucket; a bucket holding few keys but a
   * large share of rows IS the hot-key signature. ONE data-volume
   * shuffle (the per-key count, map-side combined); the count-of-
   * counts aggregate runs over distinct keys only.
   */
  def skewReport(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("_k")).agg(count(lit(1)).as("_n"))
      .groupBy(length(bin(col("_n"))).as("count_bits"))
      .agg(count(lit(1)).as("n_keys"), sum(col("_n")).as("n_rows"),
        min(col("_n")).as("min_count"), max(col("_n")).as("max_count"))

  /**
   * Two-phase salted sum/count aggregation. `aggs` maps output column
   * name -> the column to decimal-sum (exactness preserved: decimal
   * partials merge losslessly, unlike double sums).
   */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                sums: Map[String, Column], buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partialAggs = sums.toSeq.map { case (name, c) =>
      sum(c.cast("decimal(28,4)")).as(s"_p_$name")
    } :+ count(lit(1)).as("_p_n")
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.toSeq.map { name =>
      sum(col(s"_p_$name")).cast("double").as(name)
    } :+ sum(col("_p_n")).as("n")
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /**
   * Salted join for a skewed fact side: fact rows get a random salt in
   * [0, buckets); the (small-ish) dim side replicates once per salt so
   * every (key, salt) pair still matches. A hot fact key now spreads
   * over `buckets` reducers instead of one. (AQE's skew-join split
   * covers sort-merge joins automatically; this is the explicit form
   * for when the optimizer can't see the skew — e.g. post-explode.)
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(replicatedDim, keys :+ "_salt").drop("_salt")
  }
}
