package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * [[AnnIndex.appendIvfIndex]] / [[AnnIndex.compactIvfIndex]]: the
 * append lifecycle a growing corpus needs — new vectors join the
 * FROZEN cells, the stamp records every delta part, probes stay
 * coherence-guarded, drift refuses loudly, and compaction rewrites
 * files without changing a single probe row. The equivalence anchor
 * is the nprobe = nlist contract: with every cell probed, assignment
 * cannot affect results, so an appended index must return EXACTLY the
 * rows of a full rebuild (q_llm_ann_append_check pins the same thing
 * against the DuckDB-oracled count at corpus scale).
 */
class AnnIndexAppendSpec extends SparkTestBase {
  import spark.implicits._

  private val dims = 4
  private val nlist = 2

  /** Two well-separated blobs so the 2-cell quantizer is stable; the
    * jitter depends on id only mod small primes, so delta ids (100+)
    * draw from the SAME distribution as the base — no genuine drift. */
  private def vec(id: Long, blob: Int): (Long, Seq[Double]) = {
    val c = if (blob == 0) 0.0 else 10.0
    (id, Seq(c + 0.01 * (id % 7), c - 0.02 * (id % 5), c + 0.5, 1.0))
  }

  private def mkTable(rows: Seq[(Long, Seq[Double])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_annapp_tbl").toString
    rows.toDF("vec_id", "embedding").repartition(2)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private val baseRows = (1L to 20L).map(i => vec(i, (i % 2).toInt))
  private val deltaRows = (101L to 110L).map(i => vec(i, (i % 2).toInt))

  private def topk(queries: DataFrame, tbl: String, idx: String): Set[(Long, Long, Int)] = {
    val out = AnnIndex.ivfLookupIndexed(spark, queries, tbl, idx,
        k = 3, nprobe = nlist, excludeSelf = true)
      .select(col("qid"), col("nid"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    CachedRelations.releaseAll()
    out
  }

  test("append refuses an unstamped path (no silent v0 restart) and a repeat delta") {
    val base = mkTable(baseRows)
    val delta = mkTable(deltaRows)
    val idx = java.nio.file.Files.createTempDirectory("graft_annapp_v0").toString
    val e0 = intercept[IllegalStateException] {
      AnnIndex.appendIvfIndex(spark, spark.read.parquet(delta), delta, idx, base)
    }
    assert(e0.getMessage.contains("no silent v0 restart"), e0.getMessage)
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(base), base, idx,
      "vec_id", "embedding", dims, nlist)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(delta), delta, idx, base)
    val e1 = intercept[IllegalArgumentException] {
      AnnIndex.appendIvfIndex(spark, spark.read.parquet(delta), delta, idx, base)
    }
    assert(e1.getMessage.contains("already part"), e1.getMessage)
  }

  test("appended index == full rebuild at nprobe = nlist; stamp carries the part") {
    val base = mkTable(baseRows)
    val delta = mkTable(deltaRows)
    val full = mkTable(baseRows ++ deltaRows)
    val idxA = java.nio.file.Files.createTempDirectory("graft_annapp_a").toString
    val idxR = java.nio.file.Files.createTempDirectory("graft_annapp_r").toString
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(base), base, idxA,
      "vec_id", "embedding", dims, nlist)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(delta), delta, idxA, base)
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(full), full, idxR,
      "vec_id", "embedding", dims, nlist)
    val meta = AnnIndex.readMeta(spark, idxA).get
    assert(meta.version == 1 && meta.parts.map(_._1) == Seq(delta),
      s"stamp must record the appended part, got $meta")
    val queries = spark.read.parquet(full)
    assert(topk(queries, base, idxA) == topk(queries, full, idxR),
      "appended index diverged from a full rebuild at nprobe = nlist")
    // every appended row is also findable as a neighbor source
    assert(topk(queries, base, idxA).exists(_._1 > 100L))
  }

  test("a mutated delta (or base) after append fails STALE at probe time") {
    val base = mkTable(baseRows)
    val delta = mkTable(deltaRows)
    val idx = java.nio.file.Files.createTempDirectory("graft_annapp_st").toString
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(base), base, idx,
      "vec_id", "embedding", dims, nlist)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(delta), delta, idx, base)
    Seq(vec(999L, 0)).toDF("vec_id", "embedding")
      .write.mode("append").parquet(delta)
    val e = intercept[IllegalStateException] {
      AnnIndex.ivfLookupIndexed(spark, spark.read.parquet(base), base, idx,
        k = 3, nprobe = nlist)
    }
    assert(e.getMessage.contains("STALE") && e.getMessage.contains(delta),
      e.getMessage)
  }

  test("drift guard: a delta far from the fitted cells refuses with a rebuild hint") {
    val base = mkTable(baseRows)
    val far = mkTable((201L to 210L).map(i => (i, Seq(5000.0 + i, -5000.0, 777.0, 1.0))))
    val idx = java.nio.file.Files.createTempDirectory("graft_annapp_dr").toString
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(base), base, idx,
      "vec_id", "embedding", dims, nlist)
    val e = intercept[IllegalStateException] {
      AnnIndex.appendIvfIndex(spark, spark.read.parquet(far), far, idx, base)
    }
    assert(e.getMessage.contains("DRIFT") && e.getMessage.contains("rebuild"),
      e.getMessage)
    // the refused index is untouched and still verifies
    assert(AnnIndex.verify(spark, base, idx, "ivf").version == 0)
    // an explicit driftFactor override admits it (the caller's call)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(far), far, idx, base,
      driftFactor = 1e12)
    assert(AnnIndex.verify(spark, base, idx, "ivf").version == 1)
  }

  test("compaction: probe rows identical, fewer code files, stamp parts preserved") {
    val base = mkTable(baseRows)
    val d1 = mkTable(deltaRows)
    val d2 = mkTable((301L to 310L).map(i => vec(i, (i % 2).toInt)))
    val idx = java.nio.file.Files.createTempDirectory("graft_annapp_cp").toString
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(base), base, idx,
      "vec_id", "embedding", dims, nlist)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(d1), d1, idx, base)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(d2), d2, idx, base)
    val queries = spark.read.parquet(base)
    val before = topk(queries, base, idx)
    def nFiles: Int = {
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$idx/codes"), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val filesBefore = nFiles
    AnnIndex.compactIvfIndex(spark, idx, base)
    val meta = AnnIndex.readMeta(spark, idx).get
    assert(meta.version == 3 && meta.parts.map(_._1) == Seq(d1, d2),
      s"compaction must preserve the part list, got $meta")
    assert(nFiles < filesBefore,
      s"compaction must reduce code files ($filesBefore -> $nFiles)")
    assert(nFiles <= nlist, s"expected one file per cell, got $nFiles")
    assert(topk(queries, base, idx) == before,
      "compaction changed probe results")
  }

  test("a death window mid-append leaves a loudly unverifiable index") {
    val base = mkTable(baseRows)
    val delta = mkTable(deltaRows)
    val idx = java.nio.file.Files.createTempDirectory("graft_annapp_dd").toString
    AnnIndex.writeIvfIndex(spark, spark.read.parquet(base), base, idx,
      "vec_id", "embedding", dims, nlist)
    AnnIndex.appendIvfIndex(spark, spark.read.parquet(delta), delta, idx, base)
    // simulate the mid-lifecycle death: stamp dropped (as append does
    // FIRST), codes half-appended — verification must refuse
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(idx, "_graft_ann_meta.json"), false))
    val e = intercept[IllegalStateException] {
      AnnIndex.ivfLookupIndexed(spark, spark.read.parquet(base), base, idx,
        k = 3, nprobe = nlist)
    }
    assert(e.getMessage.contains("no _graft_ann_meta.json"))
  }
}
