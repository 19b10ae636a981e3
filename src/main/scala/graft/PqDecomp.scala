package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Stage-level decomposition of the q_llm_ann_pq pipeline (optimization
 * guide §1): separates the driver-side fit phases (ivfFit collect +
 * Lloyd, PQ codebook sample + m Lloyd fits) from the distributed exec
 * legs (encode pass, ADC candidate scoring, survivor windows, exact
 * rerank) on a bench-shaped session. Diagnostic only.
 */
object PqDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.ensure(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()

    val dims = 64; val k = 3; val nlist = 16; val nprobe = 8
    val m = 16; val ksub = 32; val rerankFactor = 24; val rerankFrac = 0.2
    val sd = dims / m
    import graft.ops.Similarity

    def emb = graft.queries.Queries.t(spark, sfDir, "embeddings")
    def vRel = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))

    def secs[T](tag: String)(fn: => T): T = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"PQDECOMP $tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(tag: String)(fn: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = (0 until 3).map(_ => once()).min
      println(f"PQDECOMP $tag%-26s $best%7.3f s (min of 3 warm)")
    }

    // driver fit phases (timed cold, once each — they run at query build)
    val (assigned, cents) = secs("ivfFit")(Similarity.ivfFit(vRel, dims, nlist, 100000L))
    val sample = secs("pq_sample_collect") {
      vRel.select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    }
    val books = secs("pq_lloyd_x16") {
      (0 until m).toArray.map { j =>
        val pts = sample.map(x => java.util.Arrays.copyOfRange(x, j * sd, (j + 1) * sd))
        Similarity.lloyd(pts, ksub, iters = 5, seed = 42L + j)
      }
    }
    val booksFlat: Array[Double] = books.flatMap(_.flatten)
    val cn2Flat: Array[Double] = books.flatMap(_.map(_.map(x => x * x).sum))
    val buildLit = secs("lit_tree_build") {
      (0 until 3).foreach { _ =>
        array(booksFlat.map(lit).toIndexedSeq: _*)
        array(cn2Flat.map(lit).toIndexedSeq: _*)
      }
    }

    def booksLit = array(booksFlat.map(lit).toIndexedSeq: _*)
    def cn2Lit = array(cn2Flat.map(lit).toIndexedSeq: _*)
    def coded = assigned
      .withColumn("codes", call_function("pq_encode", col("v"), booksLit, lit(m), lit(ksub)))
      .withColumn("rn", sqrt(call_function("pq_cn2", col("codes"), cn2Lit, lit(ksub))))
      .filter(col("rn") > 0)
    def corpus = coded.select(col("id").as("nid"), col("cell"),
      col("codes").as("ncodes"), col("rn"))
    def q = Similarity.probeCells(
      vRel.select(col("id").as("qid"), col("v").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv"))), cents, nprobe)
    def candScored = {
      val adot = call_function("pq_adc", col("qv"), col("ncodes"), booksLit, lit(m), lit(ksub))
      q.join(corpus, "cell")
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"), (adot / (col("qn") * col("rn"))).as("acos"))
    }
    def survivors = {
      val wa = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid"))
      val effRerank = greatest(lit(rerankFactor * k),
        ceil(count(lit(1)).over(Window.partitionBy(col("qid"))) * lit(rerankFrac)).cast("int"))
      candScored
        .withColumn("arank", row_number().over(wa))
        .withColumn("_eff_rerank", effRerank)
        .filter(col("arank") <= col("_eff_rerank"))
        .select(col("qid"), col("nid"))
    }
    noop("vrel_only")(vRel)
    noop("vrel_norm")(vRel.withColumn("qn", Similarity.norm(col("v"))))
    noop("probe_explode_nowin") {
      val centLits = array(cents.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("ci"), array(c.map(lit).toIndexedSeq: _*).as("cv"),
          lit(c.map(x => x * x).sum).as("cn2"))
      }.toIndexedSeq: _*)
      vRel.select(col("id").as("qid"), col("v").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
        .withColumn("cent", explode(centLits))
        .withColumn("cdist", col("cent.cn2") - lit(2.0) * Similarity.dot(col("qv"), col("cent.cv")))
    }
    noop("probe_cells_only")(q)
    noop("encode_pass")(corpus)
    noop("cand_adc_scored")(candScored)
    noop("survivor_windows")(survivors)
    noop("surv_rn_only_lit200") {
      val wa = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid"))
      candScored.withColumn("arank", row_number().over(wa))
        .filter(col("arank") <= lit(200))
        .select(col("qid"), col("nid"))
    }
    noop("surv_fused_one_window") {
      val wa = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid"))
      val effRerank = greatest(lit(rerankFactor * k),
        ceil(count(lit(1)).over(wa.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)) * lit(rerankFrac)).cast("int"))
      candScored
        .withColumn("arank", row_number().over(wa))
        .withColumn("_eff_rerank", effRerank)
        .filter(col("arank") <= col("_eff_rerank"))
        .select(col("qid"), col("nid"))
    }
    noop("surv_rn_plus_aggjoin") {
      val wa = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid"))
      val cnts = candScored.groupBy(col("qid")).agg(count(lit(1)).as("_cnt"))
        .select(col("qid"), greatest(lit(rerankFactor * k),
          ceil(col("_cnt") * lit(rerankFrac)).cast("int")).as("_eff_rerank"))
      candScored.withColumn("arank", row_number().over(wa))
        .join(broadcast(cnts), "qid")
        .filter(col("arank") <= col("_eff_rerank"))
        .select(col("qid"), col("nid"))
    }
    noop("full_pipeline") {
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", dims = dims, k = k,
        nlist = nlist, nprobe = nprobe, m = m, ksub = ksub,
        rerankFactor = rerankFactor, rerankFrac = rerankFrac)
    }
    spark.stop()
  }
}
