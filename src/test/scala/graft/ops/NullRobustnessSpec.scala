package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Null-tolerance sweep: the driver's parquet fixtures contain no null
 * documents, so every operator's null path only exists in unit specs.
 * This suite runs each text/embedding operator over a fixture with
 * null rows and pins BOTH that nothing throws AND the documented
 * disposition of the null row (filtered vs passed through) — a null
 * doc must never silently poison a cross-engine verdict (the
 * gopherRules ADVICE finding, generalized).
 */
class NullRobustnessSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "src1", Option("the quick brown fox jumps and runs with the dog")),
      (2L, "src1", Option.empty[String]),
      (3L, "src2", Option("plain second document text body here"))
    ).toDF("doc_id", "source", "text")
  }

  test("row-local text scorers: null doc filtered (gopher) or null-scored, never fabricated") {
    val g = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(g == Set(1L, 3L)) // filtered — FALSE verdicts would diverge from a SQL oracle

    val q = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getString(2))).toMap
    assert(!q(1L)._1 && q(1L)._2 == "en")
    assert(q(2L)._1) // null in, null score out — no fabricated number
  }

  test("corpus-statistical scorers drop null docs from both sides of their stats") {
    val u = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(u == Set(1L, 3L))
    val l = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(l == Set(1L, 3L))
    val bi = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(bi == Set(1L, 3L)) // null doc feeds neither counts nor output
    val b = Ranking.bm25TopTerms(docs.filter(col("text").isNotNull), "doc_id", "text", 2)
    assert(b.count() > 0)
  }

  test("r7b additions: null doc excluded from drift/heavy-hitter stats, null string from pairs") {
    // chi-square drift: the null doc contributes to no source's tokens
    val d = TextAnalysis.chiSquareDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("src1" -> 10L, "src2" -> 6L)) // src1 counts doc 1 only

    // heavy hitters: null text emits no tokens into candidates or totals
    val hh = TextAnalysis.heavyHitters(docs, "text", kInv = 16)
      .collect().map(_.getString(0)).toSet
    assert(hh == Set("the")) // 2*16 > 16 total; nothing throws on the null row

    // edit-distance pairs: null strings are dropped before bucketing
    import spark.implicits._
    val withNull = Seq((1L, Option("abc")), (2L, Option.empty[String]),
      (3L, Option("abd"))).toDF("id", "s")
    val ep = Dedup.editDistancePairs(withNull, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ep == Set((1L, 3L)))

    // normalizeText: null in, null out — no fabricated empty string
    val n = docs.select(col("doc_id"),
        TextAnalysis.normalizeText(spark, col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!n(1L) && n(2L))

    // profile: the null cell is counted, not dropped
    val p = Profile.profileColumns(docs, Seq("text")).collect()(0)
    assert(p.getAs[Long]("n_rows") == 3L && p.getAs[Long]("n_null") == 1L)
  }

  test("dedup/fingerprint operators: null doc neither matches nor crashes") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 4, 8)
      .collect().map(_.getLong(0)).toSet
    assert(sigs == Set(1L, 3L)) // isNotNull-filtered at the source

    val pairs = Dedup.tfidfCosinePairs(docs, "doc_id", "text", threshold = 0.1)
    assert(pairs.count() == 0) // docs 1 and 3 share nothing above threshold; no NPE

    val es = Dedup.exactSubstrDedup(docs, "doc_id", "text", windowTokens = 4)
      .collect().map(_.getLong(0)).toSet
    assert(es == Set(1L, 3L)) // null doc filtered before windowing

    // boilerplate: null text has no lines — the doc drops from the
    // rebuilt output (inner join against the keep list), same as a doc
    // whose every line was boilerplate
    val bp = Dedup.boilerplateLineRemoval(docs, "doc_id", "text", "source")
      .collect().map(_.getLong(0)).toSet
    assert(bp == Set(1L, 3L))
  }

  test("contamination and span operators tolerate null docs") {
    val cs = Decontaminate.score(docs, docs.filter(col("doc_id") === 3L),
        "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // the null doc is excluded outright (a NULL n_grams/ratio row would
    // silently diverge from a SQL oracle); doc 3 self-contaminates fully
    assert(cs.keySet == Set(1L, 3L))
    assert(cs(3L) == 1000000L)

    val sd = Dedup.spanDedupHashed(docs.filter(col("text").isNotNull),
      "doc_id", "text", 3)
    assert(sd.count() == 2)
  }

  test("embedding ANN paths tolerate a null vector row") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = ((1L to 20L).map(i => (i, Option(Array.fill(8)(rnd.nextFloat())))) :+
      (21L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding", dims = 8, k = 1, planes = 4)
      .collect().map(_.getAs[Long]("qid")).toSet
    CachedRelations.releaseAll()
    assert(!lsh.contains(21L)) // null vector: null buckets join nothing
    // ivf paths filter the null row themselves — a single bad row must
    // not abort the k-means fit of a corpus-scale job
    val ivf = Similarity.ivfTopKInt8(vecs, "vec_id", "embedding",
        dims = 8, k = 1, nlist = 2, nprobe = 1)
      .collect().map(_.getAs[Long]("qid")).toSet
    assert(ivf.nonEmpty && !ivf.contains(21L))
    val q8 = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!q8.contains(21L)) // no scale to encode
  }

  test("r8b stats family: nulls drop before arithmetic, degenerate inputs yield NULL not garbage") {
    import spark.implicits._
    // auc: single tied score -> exactly 0.5; null scores/labels drop
    val tied = Seq((Some(1.0), Some(1)), (Some(1.0), Some(0)),
      (None, Some(1)), (Some(2.0), None)).toDF("s", "y")
    val a = Stats.auc(tied, "s", "y").collect().head
    assert((a.getLong(0), a.getLong(1), a.get(2)) == ((1L, 1L, 500000L)))
    // correlationMatrix: an all-null column wipes the complete-case set
    val allNull = Seq((Some(1.0), Option.empty[Double]),
      (Some(2.0), Option.empty[Double])).toDF("x", "y")
    val c = Stats.correlationMatrix(allNull, Seq("x", "y")).collect().head
    assert(c.getLong(2) == 0L && c.isNullAt(3))
    // kaplanMeier: null event flags are excluded from the risk set entirely
    val km = Survival.kaplanMeier(
      Seq((Some(1L), Some(1)), (Some(2L), Option.empty[Int]),
        (Option.empty[Long], Some(1))).toDF("dur", "ev"), "dur", "ev")
      .collect()
    assert(km.length == 1 && km.head.getLong(1) == 1L) // only the valid subject at risk
    // associations: null items never form baskets or marginals
    val ar = Associations.rules(Seq((1L, Some("x")), (1L, Option.empty[String]),
      (2L, Some("x"))).toDF("k", "item"), "k", "item")
    assert(ar.count() == 0) // no pair partner exists
  }
}
