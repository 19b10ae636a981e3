package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Pins the r16 symmetric-pair halving in [[Similarity.lshTopK]] /
 * [[AnnIndex.lshTopKIndexed]]: generating each unordered candidate
 * pair once (qid < nid) and mirroring after the distinct is
 * VALUE-identical to the historical two-sided formulation
 * (qid =!= nid over the full probe×corpus join). The meeting
 * predicate is symmetric — (q, n) meet in table t iff their buckets
 * XOR to ≤ 1 set bit among the `planes` low bits, and buckets live in
 * [0, 2^planes) — so the mirror loses no pair; this spec re-derives
 * the two-sided candidate set explicitly and compares end results
 * row-exactly on a seeded corpus sized to force bucket collisions,
 * multi-probe on and off.
 */
class LshSymmetrySpec extends SparkTestBase {

  private val dims = 8
  private def vecs: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0L until 120L).map { i =>
      (i, Array.fill(dims)(rnd.nextGaussian()))
    }.toDF("vec_id", "embedding")
  }

  /** The pre-r16 two-sided formulation, verbatim plan shape. */
  private def twoSidedTopK(df: DataFrame, k: Int, planes: Int,
                           multiProbe: Boolean, tables: Int): DataFrame = {
    graft.functions.Registry.ensure(spark)
    val v0 = df.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val vb = v0
      .withColumn("bs", call_function("lsh_buckets",
        col("v"), lit(dims), lit(planes), lit(tables)))
      .select(col("id") +: (0 until tables).map(t => col("bs").getItem(t).as(s"b_$t")): _*)
    val corpus = vb
      .withColumn("tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col(s"b_$t").as("b"))): _*)))
      .select(col("id").as("nid"), col("tb"))
    val probeCols = (0 until tables).flatMap { t =>
      val base = col(s"b_$t")
      val bs = if (multiProbe) base +: (0 until planes).map(j => base.bitwiseXOR(lit(1L << j)))
               else Seq(base)
      bs.map(b => struct(lit(t).as("t"), b.as("b")))
    }
    val q = vb
      .withColumn("tb", explode(array(probeCols: _*)))
      .select(col("id").as("qid"), col("tb"))
    val cand = q.join(corpus, "tb")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .distinct()
    val pairs = cand
      .join(v0.select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(v0.select(col("id").as("nid"), col("v").as("nv"), col("nrm").as("nn")), "nid")
      .select(col("qid"), col("nid"),
        (Similarity.dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Int)] =
    df.select(col("qid"), col("nid"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("halved-candidate lshTopK == two-sided formulation, multi-probe on") {
    val now = Similarity.lshTopK(vecs, "vec_id", "embedding",
      dims = dims, k = 3, planes = 4, multiProbe = true, tables = 3)
    val ref = twoSidedTopK(vecs, k = 3, planes = 4, multiProbe = true, tables = 3)
    val a = canon(now); val b = canon(ref)
    assert(a.nonEmpty && a == b)
    CachedRelations.releaseAll()
  }

  test("halved-candidate lshTopK == two-sided formulation, multi-probe off") {
    val now = Similarity.lshTopK(vecs, "vec_id", "embedding",
      dims = dims, k = 2, planes = 3, multiProbe = false, tables = 2)
    val ref = twoSidedTopK(vecs, k = 2, planes = 3, multiProbe = false, tables = 2)
    val a = canon(now); val b = canon(ref)
    assert(a.nonEmpty && a == b)
    CachedRelations.releaseAll()
  }

  test("mirror leg reuses the distinct's shuffle stage instead of recomputing it") {
    val out = Similarity.lshTopK(vecs, "vec_id", "embedding",
      dims = dims, k = 3, planes = 4, multiProbe = true, tables = 3)
    out.collect() // finalize the AdaptiveSparkPlan in place
    val plan = out.queryExecution.executedPlan.toString
    // AQE's stage cache keys on the canonicalized exchange subtree, so
    // the mirrored candidate leg must resolve to the SAME shuffle
    // query stage as the distinct — one candidate join+distinct is
    // paid, not two.
    assert(plan.contains("isFinalPlan=true"), s"plan did not finalize:\n$plan")
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      s"expected the mirrored candidate leg to reuse the distinct's stage:\n$plan")
    CachedRelations.releaseAll()
  }
}
