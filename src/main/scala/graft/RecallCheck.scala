package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Measures recall@k of the ANN paths vs brute force on real embeddings. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.queries.Queries.t(spark, dir, "embeddings")
    val k = 3
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k))
    def rec(s: Set[(Long, Long)]) = (truth & s).size.toDouble / truth.size
    // headline lines use the PRODUCTION configs (the ones the
    // q_llm_ann_* queries run); the sweeps below map the tradeoff
    val lsh = pairs(Similarity.lshTopK(e, "vec_id", "embedding", 64, k, planes = 5, tables = 6))
    val ivf = pairs(Similarity.ivfTopK(e, "vec_id", "embedding", 64, k, nlist = 16, nprobe = 8))
    val ivf8 = pairs(Similarity.ivfTopKInt8(e, "vec_id", "embedding", 64, k, nlist = 16, nprobe = 8))
    val pq = pairs(Similarity.ivfPqTopK(e, "vec_id", "embedding", 64, k,
      nlist = 16, nprobe = 8, m = 16, ksub = 32, rerankFactor = 24))
    val bin = pairs(Similarity.binaryTopK(e, e, "vec_id", "embedding", 64, k, rerank = 96))
    println(f"RECALL lsh=${rec(lsh)}%.3f ivf=${rec(ivf)}%.3f ivf_int8=${rec(ivf8)}%.3f ivf_pq=${rec(pq)}%.3f binary=${rec(bin)}%.3f n=${truth.size}")
    // config sweep for the recall/candidate-volume tradeoff table
    for ((t, mp, pl) <- Seq((1, true, 6), (2, true, 6), (4, false, 6), (4, true, 6),
                            (6, true, 6), (8, true, 6), (6, true, 7), (4, true, 5))) {
      val r = rec(pairs(Similarity.lshTopK(e, "vec_id", "embedding", 64, k,
        planes = pl, multiProbe = mp, tables = t)))
      println(f"RECALL_SWEEP tables=$t%d multiProbe=$mp%s planes=$pl%d recall=$r%.3f")
    }
    for ((nl, np) <- Seq((8, 2), (8, 3), (8, 4), (8, 5), (8, 6), (12, 4), (12, 6),
                         (12, 7), (16, 4), (16, 6), (16, 8), (16, 10))) {
      val r = rec(pairs(Similarity.ivfTopK(e, "vec_id", "embedding", 64, k,
        nlist = nl, nprobe = np)))
      println(f"RECALL_SWEEP ivf nlist=$nl%d nprobe=$np%d recall=$r%.3f")
    }
    for ((mm, ks, rf) <- Seq((8, 16, 4), (8, 16, 8), (8, 16, 16), (8, 32, 8),
                             (16, 16, 8), (16, 32, 8), (16, 16, 16), (16, 32, 16))) {
      val r = rec(pairs(Similarity.ivfPqTopK(e, "vec_id", "embedding", 64, k,
        nlist = 8, nprobe = 4, m = mm, ksub = ks, rerankFactor = rf)))
      println(f"RECALL_SWEEP pq m=$mm%d ksub=$ks%d rerank=$rf%d recall=$r%.3f")
    }
    for (rf <- Seq(24, 48, 64, 96, 128, 192)) {
      val r = rec(pairs(Similarity.binaryTopK(e, e, "vec_id", "embedding", 64, k, rerank = rf)))
      println(f"RECALL_SWEEP binary rerank=$rf%d recall=$r%.3f")
    }
    spark.stop()
  }
}
