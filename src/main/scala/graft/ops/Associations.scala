package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Association-rule mining over per-key item baskets (market-basket /
 * event-affinity analysis): for each ordered item pair (antecedent →
 * consequent) co-occurring in >= `minKeys` baskets, emit
 *
 *   support_micro    = n_ab·10⁶ div N        (P(A ∧ B))
 *   confidence_micro = n_ab·10⁶ div n_a      (P(B | A))
 *   lift_micro       = n_ab·N·10⁶ div (n_a·n_b)
 *
 * — all integral division on exact counts, bit-identical in any
 * engine (the repo's standard micro recipe; `Graphs.cooccurrenceLift`
 * is the within-document positional cousin, this is the per-basket
 * set-membership form).
 *
 * Scale shape: distinct (key, item) is one map-side-combined shuffle
 * of the event volume; the pair stage self-joins per basket, so work
 * is Σ_k |basket_k|² — bounded by `maxBasketSize` (baskets above it
 * are dropped whole, the skew valve every pair generator here
 * carries); item marginals are item-cardinality small and broadcast.
 * The 1-row basket count N rides a broadcast too.
 */
object Associations {

  def rules(df: DataFrame, keyCol: String, itemCol: String,
            minKeys: Long = 1L, maxBasketSize: Int = 10000): DataFrame = {
    require(minKeys >= 1, "minKeys must be >= 1")
    val ki = df.filter(col(itemCol).isNotNull)
      .select(col(keyCol).as("k"), col(itemCol).as("item")).distinct()
    val baskets = ki.groupBy(col("k"))
      .agg(collect_list(col("item")).as("items"))
      .filter(size(col("items")) <= maxBasketSize)
    val pairs = baskets
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a") =!= col("b")) // ordered pairs: both directions
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minKeys)
    val marginals = ki.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val nKeys = ki.select(count_distinct(col("k")).as("n_keys"))
    pairs
      .join(broadcast(marginals.select(col("item").as("a"), col("n_item").as("n_a"))), "a")
      .join(broadcast(marginals.select(col("item").as("b"), col("n_item").as("n_b"))), "b")
      .crossJoin(broadcast(nKeys))
      .withColumn("support_micro", expr("n_ab * 1000000 div n_keys"))
      .withColumn("confidence_micro", expr("n_ab * 1000000 div n_a"))
      // lift's numerator is count² · 10⁶ — DECIMAL(38,0), not BIGINT,
      // so the arithmetic stays exact at corpus-scale basket counts
      // (the DuckDB twin's HUGEINT is int128; both wrap-free)
      .withColumn("lift_micro",
        expr("cast(cast(n_ab as decimal(38,0)) * n_keys * 1000000 div " +
          "(cast(n_a as decimal(38,0)) * n_b) as bigint)"))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("n_ab"), col("support_micro"), col("confidence_micro"), col("lift_micro"))
  }
}
