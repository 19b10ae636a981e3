package graft.ops

import graft.SparkTestBase

/**
 * Standing recall gate for the ANN family: every production operating
 * point (the exact configs the q_llm_ann_* queries run) must retrieve
 * at least [[graft.RecallCheck.floor]] of the brute-force top-3 pairs
 * on the real sf0.001 embeddings. The ANN paths are rows-only in the
 * DuckDB gate (engine-local cells/planes), so THIS is their red row:
 * an operator change that quietly costs recall fails the build here,
 * and the per-round RECALL_r{N}.json artifact tracks the same numbers
 * across all SFs.
 */
class RecallFloorSpec extends SparkTestBase {

  test("ANN production operating points clear the recall floor at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
    val (recalls, nTruth) = graft.RecallCheck.headline(spark, dir, k = 3)
    assert(nTruth > 1000, s"suspiciously small truth set: $nTruth")
    assert(recalls.keySet ==
      Set("lsh", "ivf", "ivf_int8", "ivf_pq", "binary", "ivf_loaded", "lsh_loaded"))
    recalls.toSeq.sortBy(_._1).foreach { case (path, r) =>
      assert(r >= graft.RecallCheck.floor,
        f"$path recall@3 $r%.3f below floor ${graft.RecallCheck.floor}")
    }
  }
}
