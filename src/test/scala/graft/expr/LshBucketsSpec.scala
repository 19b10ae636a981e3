package graft.expr

import graft.SparkTestBase
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The native lsh_buckets loop must produce bit-identical buckets to
  * the unrolled lshBucket column formula it replaced. */
class LshBucketsSpec extends SparkTestBase {

  test("expression buckets == unrolled column-formula buckets, every table") {
    import spark.implicits._
    graft.functions.Registry.ensure(spark)
    val dims = 16; val planes = 6; val tables = 3
    val rnd = new scala.util.Random(7)
    val df = (1 to 50).map(i => (i.toLong, Array.fill(dims)(rnd.nextGaussian())))
      .toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    val withBoth = (0 until tables).foldLeft(
      df.withColumn("bs", call_function("lsh_buckets",
        col("v"), lit(dims), lit(planes), lit(tables)))) { (d, t) =>
      d.withColumn(s"ref_$t", Similarity.lshBucket(col("v"), dims, planes, t))
    }
    withBoth.collect().foreach { r =>
      val bs = r.getAs[scala.collection.Seq[Long]]("bs")
      (0 until tables).foreach { t =>
        assert(bs(t) == r.getAs[Long](s"ref_$t"), s"table $t, id ${r.getAs[Long]("id")}")
      }
    }
  }

  test("short vectors (fewer elements than dims) do not crash; nulls stay null") {
    import spark.implicits._
    graft.functions.Registry.ensure(spark)
    val df = Seq((1L, Some(Array(1.0, -2.0))), (2L, None))
      .toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    val rows = df.withColumn("bs", call_function("lsh_buckets",
        col("v"), lit(8), lit(4), lit(2)))
      .orderBy("id").collect()
    assert(rows(0).getAs[scala.collection.Seq[Long]]("bs").length == 2)
    assert(rows(1).isNullAt(2))
  }
}
