package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PQ kernel parity on a hand-computed 2-subspace codebook. */
class PqExprsSpec extends SparkTestBase {

  // m=2 subspaces of 2 dims, ksub=2 centroids each, flat layout
  // [(j*ksub + c)*sd + i]: subspace 0 centroids (1,2), (9,9);
  // subspace 1 centroids (0,0), (3,4)
  private val books = Array(1.0, 2.0, 9.0, 9.0, 0.0, 0.0, 3.0, 4.0)

  test("pq_encode / pq_adc / pq_cn2 against hand arithmetic") {
    graft.functions.Registry.ensure(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "v")
      .withColumn("codes", call_function("pq_encode",
        col("v").cast("array<double>"), lit(books), lit(2), lit(2)))
    val codes = df.select(col("codes")).head().getSeq[Int](0)
    // subspace 0: (1,2) is exact (d=0) -> code 0; subspace 1: (3,4) is
    // exact -> code 1
    assert(codes == Seq(0, 1))
    val out = df.select(
      call_function("pq_adc", col("v").cast("array<double>"), col("codes"),
        lit(books), lit(2), lit(2)).as("adot"),
      call_function("pq_cn2", col("codes"),
        lit(Array(5.0, 162.0, 0.0, 25.0)), lit(2)).as("n2")).head()
    // adc = (1,2).(1,2) + (3,4).(3,4) = 5 + 25 = 30; cn2 = 5 + 25
    assert(out.getDouble(0) == 30.0)
    assert(out.getDouble(1) == 30.0)
  }

  test("pq_encode tie-break: first centroid wins equal distances") {
    graft.functions.Registry.ensure(spark)
    import spark.implicits._
    // both centroids equidistant from (2,2) in subspace 0
    val b = Array(1.0, 2.0, 3.0, 2.0)
    val codes = Seq(Seq(2.0, 2.0)).toDF("v")
      .select(call_function("pq_encode", col("v").cast("array<double>"),
        lit(b), lit(1), lit(2)).as("c")).head().getSeq[Int](0)
    assert(codes == Seq(0))
  }
}
