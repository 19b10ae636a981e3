package graft.cli

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The maintenance CLI end-to-end over real temp tables: bloom-index
  * build, coherent verify, compaction with automatic index rebuild,
  * stale-index detection (exit 1 with the precise reason), and a
  * Z-order rewrite — the OPTIMIZE lifecycle a platform schedules. */
class MaintainCliSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom-index -> verify -> compact(auto-rebuild) -> verify; stale detected after out-of-band rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_maintain").toString
    val tbl = s"$tmp/tbl"
    val df = (0 until 6000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    df.repartition(12, col("k")).write.parquet(tbl)

    // build under the default sibling convention
    assert(Maintain.run(spark, "bloom-index",
      Map("path" -> tbl, "column" -> "k", "items" -> "10000")) == 0)
    val idx = s"${tbl}_bloomidx_k"
    assert(new java.io.File(idx, "_graft_index_meta.json").exists())
    assert(Maintain.run(spark, "verify-index",
      Map("path" -> tbl, "column" -> "k")) == 0)

    // compaction merges files AND rebuilds the discovered index
    val total = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(tbl)).getLength
    assert(Maintain.run(spark, "compact",
      Map("path" -> tbl, "target-bytes" -> total.toString,
        "small-bytes" -> total.toString)) == 0)
    assert(Maintain.run(spark, "verify-index",
      Map("path" -> tbl, "column" -> "k")) == 0,
      "index must be coherent after compact's auto-rebuild")
    // the pruned read still answers exactly
    val got = graft.ops.Layout.bloomPrunedRead(spark, tbl, idx, "k", Seq(7L))
      .count()
    assert(got == 60)

    // out-of-band rewrite: verify-index reports stale with exit 1
    df.repartition(3, col("v")).write.mode("overwrite").parquet(tbl)
    assert(Maintain.run(spark, "verify-index",
      Map("path" -> tbl, "column" -> "k")) == 1)
    // the named recovery heals it
    assert(Maintain.run(spark, "bloom-index",
      Map("path" -> tbl, "column" -> "k", "items" -> "10000")) == 0)
    assert(Maintain.run(spark, "verify-index",
      Map("path" -> tbl, "column" -> "k")) == 0)
  }

  test("zorder rewrite preserves rows; usage errors exit 2") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_maintain_z").toString
    (0 until 4096).map(i => ((i * 37) % 64L, (i * 91) % 64L, i.toLong))
      .toDF("x", "y", "id").write.parquet(s"$tmp/in")
    assert(Maintain.run(spark, "zorder",
      Map("in" -> s"$tmp/in", "out" -> s"$tmp/out", "by" -> "x,y",
        "bits" -> "6", "files" -> "8")) == 0)
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 4096 && !back.columns.contains("zval"))

    assert(Maintain.run(spark, "compact", Map("path" -> s"$tmp/in")) == 2)
    assert(Maintain.run(spark, "nonsense", Map.empty) == 2)
  }
}
