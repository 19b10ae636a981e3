package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over edge relations (extensions beyond the
 * reference: centrality over the near-duplicate pair graph ranks the
 * "hub" documents of duplicate clusters for curation triage — the
 * highest-rank node of a cluster is the copy every other member
 * resembles most broadly).
 */
object Graphs {

  /**
   * PageRank over an UNDIRECTED edge set, fixed iteration count, EXACT
   * integer arithmetic: ranks are parts-per-billion longs; with
   * base = 1e9 div n_nodes, each iteration computes
   * pr'(v) = (1500 * base) div 10000 + (8500 * sum contrib(u)) div 10000,
   * contrib(u) = pr(u) div deg(u) — integral division throughout, so
   * the result is bit-identical in any engine (the DuckDB oracle
   * macro-expands the same iterations as chained CTEs). Damping 0.85
   * expressed in basis points; ranks deliberately NOT renormalized
   * (truncation loss stays in the teleport term, identically in both
   * engines).
   *
   * Scale shape: per iteration ONE join of the edge relation with the
   * 16-byte-per-node rank relation (shuffle on src) and ONE
   * aggregation shuffle on dst — the standard distributed PageRank
   * data movement; no adjacency list ever materializes per-node. The
   * degree relation is localCheckpoint'ed once (reused by every
   * iteration — without the cut each iteration would re-derive it
   * from the raw edges and the lineage would deepen quadratically).
   * Every node has >= 1 edge by construction, so there is no dangling
   * mass to redistribute.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = deg.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val base = 1000000000L / n
    var pr = deg.withColumn("pr", lit(base))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(pr.select(col("node").as("src"), expr("pr div deg").as("c")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("sc"))
      pr = deg.join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit((1500L * base) / 10000L) +
            expr("(8500 * coalesce(sc, CAST(0 AS BIGINT))) div 10000")).as("pr"))
    }
    pr.select(col("node"), col("deg"), col("pr").as("pr_ppb"))
  }
}
