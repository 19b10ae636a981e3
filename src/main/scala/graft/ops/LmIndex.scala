package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted n-gram LM artifacts — the KenLM production lifecycle for
 * [[TextAnalysis.modifiedKneserNeyLogProb]]: at 100 TB the reference
 * LM (CCNet fits it on clean Wikipedia) is trained ONCE and then
 * scores crawl snapshots for weeks, so refitting the model tables on
 * every scoring run re-reads the whole reference corpus for nothing.
 *
 * Same stamped-coherence lifecycle as the bloom side-index and
 * [[AnnIndex]] (fingerprint stamp → verified read → loud STALE →
 * rebuild heals):
 *
 *  1. [[writeMknIndex]] fits the mkn3 model tables on the train table
 *     and persists exactly three artifacts — the trigram TYPE counts,
 *     the bigram TYPE counts, and the ONE-ROW discount/(B,V) table —
 *     stamped with the train table's file-listing fingerprint
 *     ([[Layout.tableFingerprint]]). The stamp is written LAST and
 *     dropped FIRST on rebuild, so a write that dies midway never
 *     carries a valid stamp.
 *  2. [[scoreMknIndexed]] verifies the stamp against the live train
 *     table BEFORE planning, then scores through the IDENTICAL plan
 *     the in-session operator builds ([[TextAnalysis.mknScoreRows]]):
 *     counts are longs and the disc row's doubles round-trip parquet
 *     bit-exactly, so a loaded-model score equals its in-session twin
 *     row for row (equivalence-oracled by q_llm_mkn_index_check).
 *
 * The per-context stats (ctx3 / den2 / cont1) are NOT persisted: they
 * derive from the persisted type tables at type volume inside the
 * scoring plan — storing them would triple the artifact for work the
 * optimizer does in one pass over a vocabulary-bounded relation. What
 * the artifact saves is the CORPUS-volume fit (tokenize + two n-gram
 * shuffles over the reference), which is the expensive part at scale.
 */
object LmIndex {

  /** Coherence stamp beside an LM artifact. */
  case class LmIndexMeta(kind: String, textCol: String, tableFp: String)

  private val metaName = "_graft_lm_meta.json"

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeMeta(spark: SparkSession, indexPath: String,
                        meta: LmIndexMeta): Unit = {
    val (fs, p) = fsFor(spark, indexPath)
    val json = s"""{"kind":"${meta.kind}","text_col":"${meta.textCol}",""" +
      s""""table_fp":"${meta.tableFp}"}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(p, metaName), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read an artifact's stamp; None if absent (not produced by a
    * writer here, or a write that died before the stamp). */
  def readMeta(spark: SparkSession, indexPath: String): Option[LmIndexMeta] = {
    val (fs, p) = fsFor(spark, indexPath)
    val mp = new org.apache.hadoop.fs.Path(p, metaName)
    if (!fs.exists(mp)) return None
    val in = fs.open(mp)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def str(k: String) =
      ("\"" + k + "\":\"([^\"]*)\"").r.findFirstMatchIn(text).map(_.group(1))
    for {
      kind <- str("kind"); tc <- str("text_col"); fp <- str("table_fp")
    } yield LmIndexMeta(kind, tc, fp)
  }

  /** Verify the artifact is coherent with the live train table BEFORE
    * any scoring plan reads it: loud failure on a missing stamp, a
    * different kind/textCol, or a STALE fingerprint (the reference
    * corpus changed since the fit — the model describes counts that
    * no longer exist). One metadata-scale listing; no data read. */
  def verify(spark: SparkSession, trainPath: String, indexPath: String,
             kind: String, textCol: String): LmIndexMeta = {
    val meta = readMeta(spark, indexPath).getOrElse(throw new IllegalStateException(
      s"LM artifact at $indexPath has no $metaName coherence stamp — rebuild it " +
        s"with LmIndex.writeMknIndex($trainPath, $indexPath, ...)"))
    if (meta.kind != kind || meta.textCol != textCol) throw new IllegalStateException(
      s"LM artifact at $indexPath is (kind '${meta.kind}', textCol '${meta.textCol}'), " +
        s"not (kind '$kind', textCol '$textCol') — wrong model for this scorer")
    val live = Layout.tableFingerprint(spark, trainPath)
    if (live != meta.tableFp) throw new IllegalStateException(
      s"LM artifact at $indexPath is STALE: the data files of $trainPath changed " +
        s"since the model was fitted (listing fingerprint ${meta.tableFp.take(12)}… " +
        s"at fit vs ${live.take(12)}… now). The persisted n-gram counts describe a " +
        "corpus that no longer exists — rebuild with LmIndex.writeMknIndex.")
    meta
  }

  private def dropStamp(spark: SparkSession, indexPath: String): Unit = {
    val (fs, p) = fsFor(spark, indexPath)
    val mp = new org.apache.hadoop.fs.Path(p, metaName)
    if (fs.exists(mp) && !fs.delete(mp, false)) throw new java.io.IOException(
      s"could not remove the existing LM artifact stamp $mp before rebuild")
  }

  /**
   * Fit the mkn3 model on the table at `trainPath` and persist it as
   * a stamped artifact: `tri` (trigram type counts), `big` (bigram
   * type counts), `disc` (the one-row discount/(B,V) table). The fit
   * is the SAME corpus-volume plan the in-session operator runs.
   */
  def writeMknIndex(spark: SparkSession, trainPath: String, indexPath: String,
                    idCol: String, textCol: String): Unit = {
    dropStamp(spark, indexPath)
    val train = spark.read.parquet(trainPath)
    val toks = TextAnalysis.mknTokedOf(train, idCol, textCol)
    val tri = CachedRelations.track(
      TextAnalysis.mknTriples(toks)
        .groupBy(col("u"), col("v"), col("w")).agg(count(lit(1)).as("_cuvw"))
        .persist())
    val big = CachedRelations.track(TextAnalysis.mknBigrams(toks).persist())
    val cont2 = tri.groupBy(col("v"), col("w")).agg(count(lit(1)).as("_n2vw"))
    try {
      tri.write.mode("overwrite").parquet(s"$indexPath/tri")
      big.write.mode("overwrite").parquet(s"$indexPath/big")
      TextAnalysis.mknDiscRow(tri, cont2, big, toks)
        .repartition(1).write.mode("overwrite").parquet(s"$indexPath/disc")
    } finally CachedRelations.releaseAll()
    writeMeta(spark, indexPath,
      LmIndexMeta("mkn3", textCol, Layout.tableFingerprint(spark, trainPath)))
  }

  /**
   * Score `df` under the PERSISTED mkn3 model — verify the stamp,
   * read the three artifacts, derive the per-context stats at type
   * volume, run the identical scoring plan. No corpus-volume work
   * touches the reference corpus. Output: (idCol, n_tokens,
   * sum_nll_micro, avg_nll_micro), row-identical to
   * modifiedKneserNeyLogProb(df, …, train = <the fitted corpus>).
   */
  def scoreMknIndexed(spark: SparkSession, df: DataFrame, idCol: String,
                      textCol: String, trainPath: String,
                      indexPath: String): DataFrame = {
    verify(spark, trainPath, indexPath, "mkn3", textCol)
    val toked = TextAnalysis.mknTokedOf(df, idCol, textCol)
    val tf3 = TextAnalysis.mknTriples(toked)
      .groupBy(col("id"), col("u"), col("v"), col("w")).agg(count(lit(1)).as("_tf"))
    val tri = CachedRelations.track(
      spark.read.parquet(s"$indexPath/tri").persist())
    val big = spark.read.parquet(s"$indexPath/big")
    val cont2 = CachedRelations.track(
      tri.groupBy(col("v"), col("w")).agg(count(lit(1)).as("_n2vw")).persist())
    val disc = spark.read.parquet(s"$indexPath/disc")
    TextAnalysis.mknScoreRows(idCol, toked, tf3, tri, big, cont2, disc)
  }
}
