package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Count-Min sketch as RELATIONAL algebra (Cormode & Muthukrishnan
 * 2005): `d` hash rows × `w` buckets; each item increments bucket
 * h_j(x) mod w in every row j; the estimate for a key is the MIN of
 * its d bucket counts — always ≥ the true count, and within εN
 * (ε = e/w) with probability 1 − e^−d.
 *
 * Expressing the sketch as a GROUP BY means the build is one
 * map-side-combined shuffle of (row, bucket) pairs — d rows per item
 * — and the finished sketch is d·w rows TOTAL regardless of corpus
 * size: the classic "ship the sketch, not the data" mergeable
 * summary (sketches of two corpora add elementwise — here a UNION
 * ALL + re-aggregate). Because the hashes are seeded and
 * deterministic, the WHOLE sketch is exactly oracle-able, not just
 * its error bound: `portableHashing=true` uses the repo's md5
 * arithmetic (DuckDB-restatable), the default uses xxhash64.
 */
object Sketches {

  private def bucketOf(j: Int, key: org.apache.spark.sql.Column, w: Int,
                       portable: Boolean): org.apache.spark.sql.Column =
    if (portable)
      pmod(conv(substring(md5(concat(lit(s"$j|"), key).cast("binary")), 1, 15), 16, 10)
        .cast("long"), lit(w))
    else pmod(xxhash64(lit(j), key), lit(w))

  /** The sketch itself: (row, bucket, cnt), d·w rows max. */
  def countMinTable(df: DataFrame, keyCol: String, d: Int = 3, w: Int = 256,
                    portableHashing: Boolean = false): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, "need 1 <= d <= 8 and w >= 2")
    val key = col(keyCol).cast("string")
    df.filter(col(keyCol).isNotNull)
      .select(posexplode(array((0 until d).map(j => bucketOf(j, key, w, portableHashing)): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /**
   * Point estimates for every distinct key: est = min over the d
   * bucket counts. The d·w-row sketch joins the key list by
   * BROADCAST — the data-volume work happened once, in the build.
   */
  def countMinEstimates(df: DataFrame, keyCol: String, d: Int = 3, w: Int = 256,
                        portableHashing: Boolean = false): DataFrame = {
    val sketch = countMinTable(df, keyCol, d, w, portableHashing)
    val key = col(keyCol).cast("string")
    val keys = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("key")).distinct()
      .select(col("key"),
        posexplode(array((0 until d).map(j =>
          bucketOf(j, col("key").cast("string"), w, portableHashing)): _*))
          .as(Seq("row", "bucket")))
    keys.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("key")).agg(min(col("cnt")).as("est"))
  }

  /**
   * Mergeable HLL distinct-count partials (Apache DataSketches HLL
   * via Spark's native `hll_sketch_agg`) — THE 100 TB cardinality
   * pattern: scan the fact table ONCE at the finest key, materialize
   * a sketch table of (keys…, hll_sketch) rows, and answer every
   * coarser rollup — region, month, global, any subset — by unioning
   * sketches ([[hllRollup]]) without ever rescanning the data. A
   * sketch row is ≤ ~2^lgK bytes regardless of cardinality, so the
   * partial table is key-cardinality sized and broadcastable; the
   * standard error is ~1.04/sqrt(2^lgK) (~1.6% at the default 12).
   */
  def hllPartials(df: DataFrame, keys: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /** Roll partials up to coarser `keys` by sketch union — no rescan;
    * input and output are both sketch tables, so rollups chain
    * (nation → region → global). */
  def hllRollup(partials: DataFrame, keys: Seq[String]): DataFrame = {
    val agg = hll_union_agg(col("hll_sketch")).as("hll_sketch")
    if (keys.isEmpty) partials.groupBy().agg(agg)
    else partials.groupBy(keys.map(col): _*).agg(agg)
  }

  /** Estimated distinct count of a sketch column (long). */
  def hllEstimate(sketch: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hll_sketch_estimate(sketch)
}
