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
      .localCheckpoint(eager = false)
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

  /**
   * Per-node triangle counts over an UNDIRECTED edge set (local
   * clustering signal on the near-dup graph: a node whose neighbors
   * are also mutual near-dups sits inside a dense duplicate cluster,
   * not a chain of borderline pairs). Output: one row per node that
   * closes at least one triangle, with its triangle count.
   *
   * Scale shape: the classic degree-ordered orientation — each edge
   * points from its lower-(degree, id) endpoint to the higher one, so
   * every wedge is enumerated exactly once FROM its lowest-degree
   * corner. Out-degree under this order is O(sqrt(m)) for any node
   * regardless of skew (a 10^6-degree hub contributes wedges only via
   * its rare lower-degree neighbors), giving the standard O(m^1.5)
   * wedge bound instead of sum(deg^2) — the difference between a
   * celebrity node producing 10^12 wedges and 10^6. Data movement:
   * one degree aggregation + two edge-volume joins (wedge build,
   * wedge close); the triangle relation itself is the only other
   * shuffle input and is at most the wedge count. The closing
   * per-node count is a map-side-combined explode of 3 ids per
   * triangle. Orientation changes WHICH joins run, never the result:
   * the triangle set is orientation-independent, which is what makes
   * the simple a<b oracle formulation comparable.
   */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge set (a < b), self-loops dropped
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by the total order pi(v) = (deg(v), v); carry pi of the
    // head so the wedge join can order its two heads without a third
    // degree lookup
    val pa = struct(col("da").as("d"), col("a").as("n"))
    val pb = struct(col("db").as("d"), col("b").as("n"))
    val dir = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(pa < pb, col("a")).otherwise(col("b")).as("u"),
        when(pa < pb, pb).otherwise(pa).as("pv"))
      .select(col("u"), col("pv").getField("n").as("v"), col("pv"))
    val wedges = dir.select(col("u"), col("v").as("x"), col("pv").as("px"))
      .join(dir.select(col("u"), col("v").as("y"), col("pv").as("py")), "u")
      .filter(col("px") < col("py"))
    val tris = wedges
      .join(dir.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"), "leftsemi")
      .select(col("u"), col("x"), col("y"))
    tris.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Synchronous label-propagation community detection (Raghavan et
   * al. 2007) made fully DETERMINISTIC: labels start as node ids; in
   * each of `iters` synchronous rounds every node adopts the most
   * frequent label among its neighbors, ties broken by the SMALLEST
   * label (the async random-order variant of the paper converges
   * faster but is irreproducible — useless for an oracle-gated
   * pipeline). Fixed iteration count, so the rounds macro-expand as
   * SQL CTEs exactly like [[pageRank]]'s. On the near-dup graph this
   * separates locally-dense communities where connected components
   * would weld everything reachable into one mega-cluster.
   *
   * Scale shape per round: one edge-volume join against the
   * 16-byte-per-node label relation (shuffle on src), one
   * (node, label) count aggregate (map-side combined), and the
   * per-node argmax window sharing the node key. Nothing ever holds
   * an adjacency list in memory.
   */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().localCheckpoint(eager = false)
    var lbl = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val w = Window.partitionBy(col("node")).orderBy(col("c").desc, col("label"))
    for (_ <- 1 to iters) {
      lbl = sym
        .join(lbl.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
    }
    lbl.withColumnRenamed("label", "community")
  }

  /**
   * Link prediction by common-neighbor count and Jaccard coefficient:
   * for every NON-adjacent pair (a, b) sharing >= 1 neighbor, emit
   * `cn` = |Γa ∩ Γb| and `jaccard_micro` = cn·10⁶ div (deg a + deg b
   * − cn) — integral division, exact in any engine. On the near-dup
   * graph this ranks "probably the same cluster but the pair edge
   * itself fell under the similarity threshold" — the triage list for
   * borderline dedup decisions.
   *
   * Scale shape: wedge generation is a self-join of the adjacency
   * relation on the MID node (one key shuffle), so the work is
   * Σ_m deg(m)² — quadratic in hub degree. `maxDegree` drops hub mid
   * nodes from wedge generation (the stop-gram bound's graph cousin:
   * a boilerplate hub connected to everything predicts nothing), so
   * pair volume is ≤ n·maxDegree²/2. Degrees in the Jaccard
   * denominator stay UNfiltered (true degrees); only the wedge pass
   * is bounded.
   */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     maxDegree: Int = 1000): DataFrame = {
    require(maxDegree >= 1, "maxDegree must be >= 1")
    val canon = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("id_a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
    val sym = canon.select(col("id_a").as("node"), col("id_b").as("nbr"))
      .union(canon.select(col("id_b").as("node"), col("id_a").as("nbr")))
    val deg = sym.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val mid = sym.join(deg.filter(col("deg") <= maxDegree).select("node"), "node")
    val cn = mid.as("x").join(mid.as("y"),
        col("x.node") === col("y.node") && col("x.nbr") < col("y.nbr"))
      .select(col("x.nbr").as("id_a"), col("y.nbr").as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("cn"))
    cn.join(canon, Seq("id_a", "id_b"), "left_anti")
      .join(deg.select(col("node").as("id_a"), col("deg").as("_da")), "id_a")
      .join(deg.select(col("node").as("id_b"), col("deg").as("_db")), "id_b")
      .withColumn("jaccard_micro", expr("cn * 1000000 div (_da + _db - cn)"))
      .select(col("id_a"), col("id_b"), col("cn"), col("jaccard_micro"))
  }
}
