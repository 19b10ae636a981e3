package graft
import org.apache.spark.sql.SparkSession

/**
 * Per-round benchmark: every registered query against
 * SPARK_GRAFT_SF_DIR, full evaluation forced through the noop sink
 * (count() alone lets Catalyst prune projections and under-measures
 * expression-heavy queries). One JSON line on stdout.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/session so the first measured query isn't charged for init
    spark.range(1000000).selectExpr("sum(id)").collect()

    // md5-portable ORACLE twins are correctness fixtures for the DuckDB
    // gate, not perf claims: md5-per-shingle is 5-10x an xxhash64, and
    // each twin's production path IS benched (q_llm_minhash_sig_x64,
    // q_llm_minhash_pairs, q_llm_simhash_pairs, q_llm_dedup_clusters,
    // q_llm_corpus_clean, q_llm_rolling_fp_x64, q_llm_winnowing_x64).
    // Benching both double-counts the same operator and buries the
    // headline in hash-function overhead.
    val oracleOnlyFixtures = Set(
      "q_llm_minhash_sig", "q_llm_minhash_pairs_md5", "q_llm_simhash_pairs_md5",
      "q_llm_dedup_clusters_md5", "q_llm_corpus_clean_md5",
      "q_llm_rolling_fp", "q_llm_winnowing")

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => oracleOnlyFixtures(name) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val excluded = oracleOnlyFixtures.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","excluded_oracle_fixtures":$excluded}""")
    spark.stop()
  }
}
