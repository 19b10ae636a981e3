package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search.
 *
 * Scale design: brute-force top-k is the correctness baseline (a
 * broadcast-able query side against a partitioned corpus — no shuffle
 * of the corpus, one window per query partition). The LSH-bucketed
 * variant is the 100 TB path: corpus shuffles ONCE on a 16-bit
 * random-hyperplane bucket key, candidates are generated only within
 * buckets (multi-probe on neighboring signs can be added by unioning
 * probe keys), so the cross product never materializes.
 */
object Similarity {

  /** Dot product of two array<double> columns — the native codegen'd
    * [[graft.expr.VecDot]] expression (left-to-right sum, identical
    * result order to the interpreted fold it replaces). */
  def dot(a: Column, b: Column): Column = {
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    call_function("vec_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for each row of `queries`, the k nearest
   * corpus rows (excluding self-id matches). Queries side should be
   * small (it is broadcast into the join); norms are computed once per
   * ROW (not per pair), so each pair costs exactly one vec_dot.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
      .withColumn("nn", norm(col("nv")))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /**
   * Deterministic pseudo-random hyperplane sign for (plane j, dim i):
   * ±1.0 derived from xxhash64 of the two literals — constant-folded
   * at plan time, identical on every executor with no broadcast state.
   */
  private def planeSign(j: Int, i: Int): Column =
    when(pmod(xxhash64(lit(j), lit(i)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket key for an array<double> vec.
    * `tableSeed` offsets the plane hash so each table of a multi-table
    * scheme draws INDEPENDENT hyperplanes (seed 0 = the original
    * single-table buckets). */
  def lshBucket(vec: Column, dims: Int, planes: Int = 16, tableSeed: Int = 0): Column =
    (0 until planes).map { j =>
      val d = (0 until dims).map(i => element_at(vec, i + 1) * planeSign(tableSeed * planes + j, i))
        .reduce(_ + _)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Shared IVF coarse-quantizer fit: k-means cell assignment for every
    * row plus the centroid arrays (for literal-inlined probe ranking).
    * Returns (corpus rows (id, v, cell), centroids). */
  private[graft] def ivfFit(v: DataFrame, dims: Int, nlist: Int,
                     maxFitVectors: Long): (DataFrame, Array[Array[Double]]) = {
    val (assigned, cents, _) = ivfFitSampled(v, dims, nlist, maxFitVectors)
    (assigned, cents)
  }

  /** [[ivfFit]] variant that also returns the collected fit sample, so
    * a caller that needs its own bounded driver sample over the SAME
    * relation (the PQ codebook fit) can reuse this one collect instead
    * of paying a second cluster job for an identical scan (r16: the
    * two collects were ~0.3 s each of the pq rows' build time). */
  private[graft] def ivfFitSampled(v: DataFrame, dims: Int, nlist: Int,
                     maxFitVectors: Long): (DataFrame, Array[Array[Double]], Array[Array[Double]]) = {
    // The quantizer only needs a REPRESENTATIVE sample — fitting k-means
    // on the full corpus is the one driver-side scale hazard at 100 TB.
    // Deterministic hash-mod downsample. The row count that sizes the
    // modulus comes from PLAN STATISTICS (sum of input file bytes / the
    // vector's own width) — metadata-only, replacing an eager count()
    // that cost a full corpus scan just to size a sample. The quantizer
    // is insensitive to the exact sample size; the modulus only needs
    // the right order of magnitude. Corpora at or under the cap
    // estimate modulus 1 and fit on everything.
    //
    // r16: the fit itself is the bounded-sample in-memory [[lloyd]]
    // (the PQ-codebook engine) instead of an MLlib KMeans — the MLlib
    // fit paid ~10 cluster-wide jobs (seeded init + 8 Lloyd rounds +
    // the collect of centers) plus an interpreted predict-UDF pass over
    // the corpus, all scheduling overhead for a 16..1024-cell coarse
    // quantizer whose arithmetic is sub-second on one core. The sample
    // collect is the SAME bounded driver state the PQ codebook fit
    // already allows (capped at min(maxFitVectors, max(20k, 40·nlist))
    // collected rows); a coarse quantizer doesn't need converged or
    // finely-placed centroids — cells only bucket candidates for exact
    // re-rank (the r8 finding, unchanged). Cell ASSIGNMENT is the
    // native codegen'd [[graft.expr.PqExprs.encode]] argmin with m = 1
    // (one subspace = the full vector): exactly the Euclidean cell
    // argmin with first-min tie-break — the same order
    // [[probeCells]]/[[cellRank]] rank by (ties on the lower ci), so
    // AnnIndexAppendSpec's assignment≡probe pin holds unchanged.
    val sampleCap = math.min(maxFitVectors, math.max(20000L, 40L * nlist))
    val estBytes = v.queryExecution.optimizedPlan.stats.sizeInBytes
    val estRows = (estBytes / BigInt(math.max(8L * dims, 64L))).toLong.max(1L)
    val sampleDf =
      if (estRows <= sampleCap) v
      else v.filter(pmod(xxhash64(col("id")), lit(estRows / sampleCap + 1)) === 0)
    val sample: Array[Array[Double]] =
      sampleDf.select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "ivfFit needs at least one non-null vector")
    val cents = lloyd(sample, nlist, iters = 8, seed = 42L)
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    val centsFlat: Array[Double] = cents.flatten
    // ONE ArrayType literal node, not dims·nlist lit() children — the
    // codebook is consumed at plan time (Registry asDoubles), so the
    // only cost of the wide tree was Catalyst walking it per analysis/
    // optimization rule on every query build (r16 guide §1.2 step 1).
    val assigned = v.withColumn("cell",
      element_at(call_function("pq_encode", col("v"),
        lit(centsFlat), lit(1), lit(nlist)), 1))
      .select(col("id"), col("v"), col("cell"))
    (assigned, cents, sample)
  }

  /** ROW-LOCAL cell ranking for [[AnnIndex.appendIvfIndex]]'s delta
    * assignment: cells of `cents` sorted by distance to the vector
    * column — the SAME metric k-means used to assign cells (Euclidean:
    * |q-c|² = |q|² - 2 q·c + |c|², and |q|² is constant per vector so
    * cn2 - 2 q·c orders identically; ties break on the cell id).
    * Returns array<struct<cdist, ci>> ascending. Row-local matters on
    * the APPEND path: duplicate delta ids must each keep their own
    * assignment (a per-id window collapses them), and a one-time
    * lifecycle op can afford the interpreted higher-order-function
    * evaluation this costs. [[probeCells]] deliberately does NOT rank
    * through this expression — on query-volume probe paths the
    * interpreted per-cell lambda measured 1.4-2.3× slower than the
    * codegen'd explode+window (r14 A/B at sf0.1: q_llm_margin_ivf
    * 2.25 → 5.15 s) — so the two formulations MUST rank identically;
    * AnnIndexAppendSpec pins cellRank[0] == probeCells(nprobe = 1)
    * on shared fixtures. */
  private[graft] def cellRank(vec: Column, cents: Array[Array[Double]]): Column = {
    val centLits = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ci"), lit(c).as("cv"),
        lit(c.map(x => x * x).sum).as("cn2"))
    }.toIndexedSeq: _*)
    array_sort(transform(centLits, c =>
      struct((c.getField("cn2") - lit(2.0) * dot(vec, c.getField("cv"))).as("cdist"),
        c.getField("ci").as("ci"))))
  }

  /** Explode a query relation against the centroid literals and keep
    * each query's `nprobe` nearest cells — the [[cellRank]] metric in
    * its codegen'd explode+window form (see there for why the
    * formulations differ and the spec that pins them equal). A max-dot
    * probe against Euclidean-assigned cells mismatches for
    * unnormalized vectors and probes the wrong cells. Input must carry
    * (qid, qv); output keeps every input column and adds `cell`.
    * Duplicate qids share one ranked set (query ids are keys on every
    * probe path; the dedup-sensitive APPEND path uses [[cellRank]]). */
  private[graft] def probeCells(q: DataFrame, cents: Array[Array[Double]],
                         nprobe: Int): DataFrame = {
    val centLits = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ci"), lit(c).as("cv"),
        lit(c.map(x => x * x).sum).as("cn2"))
    }.toIndexedSeq: _*)
    q.withColumn("cent", explode(centLits))
      .withColumn("cdist", col("cent.cn2") - lit(2.0) * dot(col("qv"), col("cent.cv")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cent.ci"))))
      .filter(col("crank") <= nprobe)
      .withColumn("cell", col("cent.ci"))
      .drop("cent", "cdist", "crank")
  }

  /**
   * IVF (inverted-file) approximate nearest neighbors: a k-means
   * coarse quantizer (MLlib, seeded — deterministic) partitions the
   * corpus into `nlist` cells; each query probes its `nprobe` nearest
   * centroids and re-ranks candidates with exact cosine. The corpus
   * shuffles ONCE on the cell id; centroids broadcast as literals.
   */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, dims: Int,
              k: Int, nlist: Int = 16, nprobe: Int = 2,
              maxFitVectors: Long = 100000L): DataFrame = {
    // null vectors would abort the k-means fit — one bad row must not
    // kill a corpus-scale job; they have no neighbors to report anyway
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val (assigned, cents) = ivfFit(v, dims, nlist, maxFitVectors)
    val corpus = assigned.select(col("id").as("nid"), col("v").as("nv"),
      col("cell")).withColumn("nn", norm(col("nv")))
    val q = probeCells(
      v.select(col("id").as("qid"), col("v").as("qv")).withColumn("qn", norm(col("qv"))),
      cents, nprobe)
    val scored = q.join(corpus, "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Cross-corpus IVF ANN lookup: `queries` and `corpus` are DIFFERENT
   * relations (the retrieval shape — eval queries against a training
   * index, new batch against yesterday's corpus), unlike [[ivfTopK]]'s
   * self-join. The quantizer fits on the CORPUS only (queries must
   * not shift the cells they search), queries probe their `nprobe`
   * nearest centroids row-cheap against the literal-inlined centroid
   * set, and candidates re-rank with exact cosine. No qid == nid
   * exclusion: the two id namespaces are unrelated. At nprobe = nlist
   * the result is exact brute-force top-k (spec-pinned).
   *
   * Scale shape: corpus shuffles ONCE on the cell id; the query side
   * shuffles at candidate volume only. The streaming face is
   * [[graft.streaming.StreamOps.ivfLookupStream]].
   */
  def ivfLookup(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dims: Int, k: Int,
                nlist: Int = 16, nprobe: Int = 2,
                maxFitVectors: Long = 100000L): DataFrame = {
    val cv = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val (assigned, cents) = ivfFit(cv, dims, nlist, maxFitVectors)
    val index = assigned.select(col("id").as("nid"), col("v").as("nv"),
      col("cell")).withColumn("nn", norm(col("nv")))
    val q = probeCells(
      queries.filter(col(vecCol).isNotNull)
        .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
        .withColumn("qn", norm(col("qv"))),
      cents, nprobe)
    val scored = q.join(index, "cell")
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Memory-bound IVF ANN: the coarse pass scores int8 CODES (the
   * [[quantizeInt8]] scheme kept row-shaped: per-vector scale =
   * max|x|/127, codes in [-127,127]) with the native integer
   * [[graft.expr.VecDotInt8]] — 4 bytes/dim less bandwidth per
   * candidate at 100 TB, where ANN is memory-bound, not compute-bound
   * — and only the `rerankFactor * k` best approximate candidates per
   * query fetch their float vectors for exact-cosine re-ranking. The
   * fetch join moves (qid, nid) pairs only — float vectors never ride
   * the candidate exchange.
   *
   * Same output contract as [[ivfTopK]] (qid, nid, cos, rank) — the
   * approximation only affects WHICH candidates reach the exact
   * re-rank, so recall tracks the float path within the quantization
   * error (RecallCheck measures both).
   */
  def ivfTopKInt8(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                  k: Int, nlist: Int = 16, nprobe: Int = 2,
                  rerankFactor: Int = 4,
                  maxFitVectors: Long = 100000L): DataFrame = {
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    def i8dot(a: Column, b: Column): Column = call_function("vec_dot_i8", a, b)
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val (assigned, cents) = ivfFit(v, dims, nlist, maxFitVectors)
    // row-local int8 encode; approximate norm comes from the codes
    // themselves (sqrt of the exact integer self-dot, times scale), so
    // the coarse pass touches nothing but codes + 2 doubles per row
    val coded = assigned
      .withColumn("scale",
        aggregate(col("v"), lit(0d), (m, x) => greatest(m, abs(x))) / lit(127d))
      .filter(col("scale") > 0)
      .withColumn("codes",
        transform(col("v"), x => floor(x / col("scale") + lit(0.5)).cast("int")))
      .withColumn("anorm",
        sqrt(i8dot(col("codes"), col("codes")).cast("double")) * col("scale"))
    val corpus = coded.select(col("id").as("nid"), col("cell"),
      col("codes").as("ncodes"), col("scale").as("nscale"), col("anorm").as("nn8"))
    val q = probeCells(
      coded.select(col("id").as("qid"), col("v").as("qv"), col("codes").as("qcodes"),
        col("scale").as("qscale"), col("anorm").as("qn8")),
      cents, nprobe).drop("qv")
    // coarse: approximate cosine from the integer dot (exact integer
    // sum; two scale multiplies and one divide of FP after)
    val wa = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid"))
    val survivors = q.join(corpus, "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        ((i8dot(col("qcodes"), col("ncodes")).cast("double") * col("qscale") * col("nscale"))
          / (col("qn8") * col("nn8"))).as("acos"))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerankFactor * k)
      .select(col("qid"), col("nid"))
    // exact re-rank: fetch float vectors for the survivor pairs only
    val vecs = v.select(col("id"), col("v")).withColumn("nrm", norm(col("v")))
    val scored = survivors
      .join(vecs.select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs.select(col("id").as("nid"), col("v").as("nv"), col("nrm").as("nn")), "nid")
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * IVF-PQ approximate nearest neighbors (Jegou 2011 shape — the
   * standard memory-bound ANN layout at corpus scale): the IVF coarse
   * quantizer bounds candidates to `nprobe` cells, and each corpus
   * vector is PRODUCT-QUANTIZED — `m` subspaces of dims/m, each with
   * its own `ksub`-centroid codebook — so a candidate costs `m` small
   * codebook lookups instead of a float-vector fetch. Queries stay
   * un-quantized (asymmetric distance computation: query slices score
   * against the candidate's codebook entries), the `rerankFactor * k`
   * best approximate candidates re-rank with exact cosine.
   *
   * ADC discrimination, like binary Hamming, does NOT sharpen as the
   * corpus grows, so a fixed absolute rerank dilutes with scale
   * (RECALL pq at rerank=24·k: 0.859/0.843/0.817 across the three
   * SFs, monotonically approaching the 0.8 floor — r15 verdict).
   * `rerankFrac` is the [[binaryTopK]] fix applied here: the
   * effective rerank set is max(rerankFactor·k, ceil(frac · C_q))
   * where C_q is the query's CELL-PRUNED candidate count (a count
   * window over the qid partition the ADC ranking already shuffles
   * on — no extra pass), so the reranked fraction of what the coarse
   * pass saw stays constant at any corpus size.
   *
   * Scale shape: the candidate exchange moves m small ints + 1 double
   * per corpus row (m=8: ~12 bytes vs 512 for a float64[64] vector —
   * the memory-bandwidth win PQ exists for); codebooks are literals
   * (m * ksub * dims/m doubles — constant-folded, zero broadcast
   * state); encode is a row-local argmin over codebook literals with
   * the native codegen'd dot. Subspace codebooks fit on the same
   * deterministic metadata-sized sample policy as [[ivfFit]].
   */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                k: Int, nlist: Int = 8, nprobe: Int = 4,
                m: Int = 16, ksub: Int = 16, rerankFactor: Int = 16,
                rerankFrac: Double = 0.0,
                maxFitVectors: Long = 100000L): DataFrame = {
    require(dims % m == 0, s"dims ($dims) must divide evenly into m ($m) subspaces")
    require(rerankFrac >= 0.0 && rerankFrac <= 1.0, "rerankFrac must be in [0, 1]")
    val sd = dims / m
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val (assigned, cents, fitSample) = ivfFitSampled(v, dims, nlist, maxFitVectors)
    // Subspace codebooks: ONE bounded driver-side sample (deterministic
    // hash-mod, ~20k vectors — a 16-centroid codebook over 4 dims needs
    // far less) then m in-memory Lloyd fits. m separate MLlib fits each
    // pay full cluster-job overhead — 16 subspaces cost more in job
    // scheduling than in arithmetic; the sample collect is the SAME
    // bounded driver state the quantizer fit policy already allows.
    // r16: when the codebook cap coincides with the coarse-quantizer
    // cap (every nlist ≤ 500 — the hash-mod filter is then identical),
    // reuse ivfFit's collected sample instead of paying a second
    // cluster job for the same scan; a larger-nlist config still
    // collects its own sample under the original cap.
    val sampleCap = math.min(maxFitVectors, 20000L)
    val ivfCap = math.min(maxFitVectors, math.max(20000L, 40L * nlist))
    val sample: Array[Array[Double]] =
      if (sampleCap == ivfCap) fitSample
      else {
        val estBytes = v.queryExecution.optimizedPlan.stats.sizeInBytes
        val estRows = (estBytes / BigInt(math.max(8L * dims, 64L))).toLong.max(1L)
        val sampleDf = if (estRows <= sampleCap) v
          else v.filter(pmod(xxhash64(col("id")), lit(estRows / sampleCap + 1)) === 0)
        sampleDf.select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      }
    require(sample.nonEmpty, "ivfPqTopK needs at least one non-null vector")
    val books: Array[Array[Array[Double]]] = (0 until m).toArray.map { j =>
      val pts = sample.map(x => java.util.Arrays.copyOfRange(x, j * sd, (j + 1) * sd))
      Similarity.lloyd(pts, ksub, iters = 5, seed = 42L + j)
    }
    // flat codebook [(j*ksub + c)*sd + i] and per-centroid squared
    // norms [j*ksub + c], passed to the native PQ kernels as plan-time
    // reference objects (the unrolled column-algebra argmin is m*ksub
    // struct terms — past janino's method limit; see PqExprs scaladoc)
    val booksFlat: Array[Double] = books.flatMap(_.flatten)
    val cn2Flat: Array[Double] = books.flatMap(_.map(_.map(x => x * x).sum))
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    // single ArrayType literals (see ivfFitSampled: plan-time-consumed
    // codebooks; m·ksub·sd lit() children only slowed analysis)
    def booksLit: Column = lit(booksFlat)
    def cn2Lit: Column = lit(cn2Flat)
    val coded = assigned
      .withColumn("codes",
        call_function("pq_encode", col("v"), booksLit, lit(m), lit(ksub)))
      .withColumn("rn",
        sqrt(call_function("pq_cn2", col("codes"), cn2Lit, lit(ksub))))
      .filter(col("rn") > 0)
    val corpus = coded.select(col("id").as("nid"), col("cell"),
      col("codes").as("ncodes"), col("rn"))
    val q = probeCells(
      v.select(col("id").as("qid"), col("v").as("qv")).withColumn("qn", norm(col("qv"))),
      cents, nprobe)
    // ADC: full-precision query against the code-reconstructed candidate
    val adot = call_function("pq_adc", col("qv"), col("ncodes"), booksLit, lit(m), lit(ksub))
    val wa = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid"))
    // the count rides the SAME (partition, order) spec as the ranking
    // with an explicit full frame — order-insensitive for a whole-
    // partition count, and it fuses both window functions into ONE
    // WindowExec pass over the candidate volume instead of two
    val effRerank =
      if (rerankFrac <= 0.0) lit(rerankFactor * k)
      else greatest(lit(rerankFactor * k),
        ceil(count(lit(1)).over(wa.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)) * lit(rerankFrac))
          .cast("int"))
    val survivors = q.join(corpus, "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), (adot / (col("qn") * col("rn"))).as("acos"))
      .withColumn("arank", row_number().over(wa))
      .withColumn("_eff_rerank", effRerank) // window exprs can't sit in a filter
      .filter(col("arank") <= col("_eff_rerank"))
      .select(col("qid"), col("nid"))
    val vecs = v.select(col("id"), col("v")).withColumn("nrm", norm(col("v")))
    val scored = survivors
      .join(vecs.select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(vecs.select(col("id").as("nid"), col("v").as("nv"), col("nrm").as("nn")), "nid")
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic in-memory Lloyd k-means for the PQ subspace
    * codebooks (seeded shuffle init over the sample; an empty cluster
    * keeps its previous centroid; first-min tie-break on assignment —
    * matches [[graft.expr.PqExprs.encode]]). */
  private[graft] def lloyd(pts: Array[Array[Double]], k: Int, iters: Int,
                           seed: Long): Array[Array[Double]] = {
    val sd = pts.head.length
    val rnd = new scala.util.Random(seed)
    val cents = rnd.shuffle(pts.indices.toList).take(math.min(k, pts.length))
      .map(i => pts(i).clone()).toArray.padTo(k, pts(0).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](sd))
      val counts = new Array[Long](k)
      for (p <- pts) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < sd) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < sd) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      for (c <- 0 until k if counts(c) > 0; i <- 0 until sd)
        cents(c)(i) = sums(c)(i) / counts(c)
    }
    cents
  }

  /**
   * Multi-table LSH approximate nearest neighbors with multi-probe:
   * `tables` independent hyperplane tables (the standard recall lever —
   * a near neighbor missed by one table's cut is usually caught by
   * another), each probed at the query's own bucket plus every bucket
   * at Hamming distance 1 (flip each plane bit). Candidates are the
   * union across tables, exact-cosine re-ranked. The corpus shuffles
   * once per table (explode on the (table, bucket) key) — at 100 TB
   * that is `tables`× the corpus shuffle volume, the documented price
   * of recall; tune `tables`/`planes` per corpus. Buckets are computed
   * ONCE per row per table; probe keys are cheap bit-flips of those
   * columns (codegen CSE keeps the hyperplane sums single-evaluation).
   */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              dims: Int, k: Int, planes: Int = 8,
              multiProbe: Boolean = true, tables: Int = 4): DataFrame = {
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    val v0 = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    // The LSH INDEX: (id, per-table bucket) — built ONCE and persisted.
    // All buckets come from the native [[graft.expr.LshBuckets]] loop
    // (one expression, not tables×planes×dims unrolled terms); both the
    // corpus side and the probe side derive from this relation, and the
    // persisted rows are ~8(tables+1) bytes — the standard "build the
    // index once" shape, cheap even at 10^9 docs.
    // Tracked in [[CachedRelations]]: the caller releases the index
    // after its action (Verify/Bench do; see that object's scaladoc) —
    // an untracked persist here would leak one relation per call for
    // the session lifetime.
    val vb = CachedRelations.track(v0
      .withColumn("bs", call_function("lsh_buckets",
        col("v"), lit(dims), lit(planes), lit(tables)))
      .select(col("id") +: (0 until tables).map(t => col("bs").getItem(t).as(s"b_$t")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // candidate generation moves ONLY (id, bucket) pairs — the 512-byte
    // vectors never ride through the bucket join or the distinct; each
    // unique candidate pair is scored exactly once after a fetch join
    // back to the (id, vec, norm) relation.
    val corpus = vb
      .withColumn("tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col(s"b_$t").as("b"))): _*)))
      .select(col("id").as("nid"), col("tb"))
    val probeCols: Seq[Column] = (0 until tables).flatMap { t =>
      val base = col(s"b_$t")
      val bs = if (multiProbe) base +: (0 until planes).map(j => base.bitwiseXOR(lit(1L << j)))
               else Seq(base)
      bs.map(b => struct(lit(t).as("t"), b.as("b")))
    }
    val q = vb
      .withColumn("tb", explode(array(probeCols: _*)))
      .select(col("id").as("qid"), col("tb"))
    // Candidate meeting is SYMMETRIC: (q, n) meet in table t iff
    // bucket_t(q) XOR bucket_t(n) has ≤ 1 bit set among the `planes`
    // low bits (multi-probe flips exactly one plane bit; buckets live
    // in [0, 2^planes) by construction), so (n, q) meets in the same
    // table via the same differing bit. Generating each unordered pair
    // ONCE (qid < nid) therefore loses nothing, halves the pair volume
    // entering the distinct exchange — the dominant leg of this
    // pipeline (r16 LshDecomp: candidates 2.15 s of the 2.71 s row) —
    // and the mirror union after the distinct is exchange-reused, not
    // recomputed. Value-identical to the two-sided formulation
    // (LshSymmetrySpec pins it; self-pairs drop with the strict <).
    val candHalf = q.join(corpus, "tb")
      .filter(col("qid") < col("nid"))
      .select(col("qid"), col("nid"))
      .distinct() // a pair can meet in more than one table/probe
    val cand = candHalf.unionByName(
      candHalf.select(col("nid").as("qid"), col("qid").as("nid")))
    val pairs = cand
      .join(v0.select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn")), "qid")
      .join(v0.select(col("id").as("nid"), col("v").as("nv"), col("nrm").as("nn")), "nid")
      .select(col("qid"), col("nid"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * Per-label centroid of the L2-normalized embeddings, long format:
   * (label, dim, centroid, n_vectors). The long shape keeps every
   * output cell scalar (array cells break column-wise comparison
   * downstream) and makes the aggregation a plain (label, dim)
   * groupBy — ONE shuffle whose width is rows×dims scalars, the same
   * map-side-combining agg at any corpus size.
   *
   * Normalization is row-local IEEE math (vec_dot + sqrt + divide:
   * bit-deterministic). The cross-row mean quantizes each normalized
   * value to integer nano-units BEFORE summation: multiply/add/floor
   * are IEEE-exact given identical input doubles, and the integer sum
   * is order-independent — unlike a double sum (partition order
   * wiggles low bits) or a double->DECIMAL cast (engines disagree on
   * the rounding of tie-adjacent values).
   */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val v = df.select(col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      // a zero vector has no direction: dval/nrm = NaN, which Spark's
      // long cast silently turns into 0 while DuckDB's CAST(floor(NaN))
      // errors — exclude such rows on BOTH sides (oracle mirrors nrm>0).
      .filter(col("nrm") > 0)
    v.select(col("label"), col("nrm"), posexplode(col("v")).as(Seq("dim", "dval")))
      .withColumn("nano",
        floor(col("dval") / col("nrm") * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("label"), col("dim"))
      .agg(
        ((sum(col("nano")).cast("double") / count(lit(1))) / lit(1e9)).as("centroid"),
        count(lit(1)).as("n_vectors"))
  }

  /**
   * Symmetric int8 scalar quantization of an embedding column, long
   * format (id, dim, code, scale_micro): per-vector scale =
   * max(|x|)/127, code = round(x/scale) in [-127, 127]. The standard
   * 4× storage/bandwidth compression for a 100 TB embedding store —
   * entirely ROW-LOCAL (pure map, no shuffle; the long format keeps
   * output cells scalar for engine-portable comparison).
   *
   * Cross-engine exactness: scale and x/scale are single IEEE
   * divides; code and scale_micro quantize via floor(x+0.5) — every
   * step bit-deterministic given the same input doubles. Zero vectors
   * (scale 0) are excluded — no direction, nothing to encode (mirror
   * the predicate in any oracle).
   */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_scale",
        aggregate(col("_v"), lit(0d), (m, x) => greatest(m, abs(x))) / lit(127d))
      .filter(col("_scale") > 0)
    v.select(col(idCol), col("_scale"),
        posexplode(col("_v")).as(Seq("dim", "x")))
      .select(col(idCol), col("dim"),
        floor(col("x") / col("_scale") + lit(0.5)).cast("int").as("code"),
        floor(col("_scale") * lit(1e6) + lit(0.5)).cast("long").as("scale_micro"))
  }

  /**
   * Signed-random-projection dimensionality reduction (Charikar 2002;
   * Achlioptas 2003 database-friendly JL projections) over the int8
   * quantization grid: rp_j = Σ_i code_i · s_{j,i} with s ∈ {−1,+1}
   * drawn from md5(seed|j|i) parity. The reduced vectors preserve
   * angles in expectation at outDims/dims the bytes — the memory-bound
   * scale path that feeds LSH/IVF when 100 TB of float vectors won't
   * fit the candidate exchange.
   *
   * Scale shape: the sign matrix is computed driver-side and inlined
   * as literals (the centroid-classification precedent), so the whole
   * projection is a PURE MAP — no join, no shuffle, not even a
   * broadcast exchange; each component is the native integer
   * [[graft.expr.VecDotInt8]] (exact Long accumulation, codegen).
   *
   * Cross-engine exactness: quantization is [[quantizeInt8]]'s
   * bit-deterministic scheme (single IEEE divide + floor(x+0.5)), and
   * everything after is exact integer arithmetic; an oracle inlines
   * the SAME literal signs. Zero vectors are excluded like
   * [[quantizeInt8]].
   */
  def randomProjectInt8(df: DataFrame, idCol: String, vecCol: String,
                        outDims: Int = 8, dims: Int = 64,
                        seed: String = "rp"): DataFrame = {
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    val signs = projectionSigns(seed, outDims, dims)
    val coded = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_scale",
        aggregate(col("_v"), lit(0d), (m, x) => greatest(m, abs(x))) / lit(127d))
      .filter(col("_scale") > 0)
      .withColumn("_codes",
        transform(col("_v"), x => floor(x / col("_scale") + lit(0.5)).cast("int")))
    val outs = (0 until outDims).map { j =>
      call_function("vec_dot_i8", col("_codes"),
        array(signs(j).map(s => lit(s)).toIndexedSeq: _*)).as(s"rp_$j")
    }
    coded.select(col(idCol) +: outs: _*)
  }

  /** Deterministic ±1 sign matrix from md5(seed|j|i) parity. Computed
    * once on the driver and inlined as literals on BOTH engine sides
    * (the oracle embeds the same values), so the derivation only needs
    * to be deterministic, not SQL-expressible. */
  def projectionSigns(seed: String, outDims: Int, dims: Int): Array[Array[Int]] =
    Array.tabulate(outDims, dims) { (j, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$seed|$j|$i".getBytes("UTF-8"))
      if ((h(h.length - 1) & 1) == 0) 1 else -1
    }

  /**
   * Nearest-centroid label assignment: score every vector against the
   * per-label centroids (long format, from [[labelCentroids]]) and
   * keep the best-cosine label (ties -> smallest label).
   *
   * Scale shape: centroids are bounded (labels × dims scalars) — they
   * are collected once and inlined as literals, so classifying the
   * full corpus is a PURE MAP: zip_with + integer-quantized dot +
   * array_min argmax per row, no join, no shuffle, no broadcast
   * exchange even.
   *
   * Cross-engine exactness: each product quantizes to integer nanos
   * before the (order-independent) sum; after that the only FP ops
   * are one divide and one sqrt, both IEEE-correctly-rounded, so the
   * score doubles are bit-identical in any engine given the same
   * centroid doubles. Labels whose centroid is all-zero have no
   * direction and are excluded (mirror the filter in any oracle).
   *
   * Labels must be integral (the long-format centroid contract from
   * [[labelCentroids]] over an int label column) — a non-numeric
   * label would cast to null here and fail fast on the collect.
   */
  def classifyByCentroid(df: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame): DataFrame = {
    val cents: Seq[(Int, Array[Double], Long)] = centroids
      .select(col("label").cast("int"), col("dim").cast("int"), col("centroid"))
      // null labels/dims would NPE the typed getters below; a null
      // centroid cell has nothing to score against
      .filter(col("label").isNotNull && col("dim").isNotNull &&
        col("centroid").isNotNull)
      .collect()
      .groupBy(_.getInt(0)).toSeq
      .map { case (lab, rows) =>
        val arr = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        val n2 = arr.map(c => math.floor(c * c * 1e9 + 0.5).toLong).sum
        (lab, arr, n2)
      }
      .filter(_._3 > 0L)
      .sortBy(_._1)
    require(cents.nonEmpty, "no non-zero centroids to classify against")
    val nDims = cents.head._2.length
    require(cents.forall(_._2.length == nDims),
      s"centroids disagree on dimensionality (expected $nDims)")
    // a vector of the wrong length would make zip_with pad with nulls
    // and poison its score to null — the null-score struct then sorts
    // FIRST in array_min, silently assigning an arbitrary label.
    // Mismatched rows are excluded instead (mirror in any oracle).
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .filter(size(col("_v")) === lit(nDims))
    val scored = cents.map { case (lab, arr, n2) =>
      val cLit = lit(arr)
      val sn = aggregate(
        zip_with(col("_v"), cLit, (x, y) => floor(x * y * lit(1e9) + lit(0.5)).cast("long")),
        lit(0L), (acc, x) => acc + x)
      val score = sn.cast("double") / lit(math.sqrt(n2.toDouble))
      // negated score: array_min then picks (max score, min label)
      struct((lit(0d) - score).as("ns"), lit(lab).as("lab"))
    }
    val best = array_min(array(scored: _*))
    v.select(col(idCol),
      best.getField("lab").as("pred_label"),
      floor((lit(0d) - best.getField("ns")) * lit(1e6) + lit(0.5)).cast("long")
        .as("score_micro"))
  }

  /** Sign-bit packing of an array<double> vector into ceil(dims/64)
    * longs: bit (i mod 64) of word (i div 64) is set iff v(i) >= 0
    * (IEEE: -0.0 >= 0 is true, so the zero sign is engine-portable).
    * Row-local; the packed words are the 1-bit quantized form — 64×
    * smaller than the double vector, 32× smaller than float. */
  def signPack(vec: Column, dims: Int): Column = {
    require(dims > 0, "dims must be positive")
    val words = (dims + 63) / 64
    array((0 until words).map { w =>
      (0 until math.min(64, dims - 64 * w)).map { i =>
        when(element_at(vec, 64 * w + i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*)
  }

  /** Hamming distance between two sign-packed vectors (arrays of
    * longs): popcount of the XOR, summed across words. Equals the
    * count of dimensions whose signs disagree. */
  def hammingDist(a: Column, b: Column): Column = {
    // native popcount loop (r16) — the aggregate(zip_with(bit_count))
    // form ran interpreted per-element lambdas on every candidate pair
    graft.functions.Registry.ensure(org.apache.spark.sql.SparkSession.active)
    call_function("hamming_x64", a, b)
  }

  /**
   * Binary-quantization nearest neighbors (the 1-bit "binary
   * embeddings + rescoring" scheme popularized by faiss's
   * IndexBinaryFlat-with-refine and vector stores' binary
   * quantization): vectors compress 32× to their sign bits, a coarse
   * pass ranks the corpus by Hamming distance on the packed words
   * (sign-agreement tracks cosine for roughly-isotropic embeddings —
   * Charikar 2002's SRP bound with identity hyperplanes), and the
   * `rerank` closest candidates per query are re-scored with exact
   * cosine. Unlike the LSH/IVF paths this is fully deterministic
   * given the inputs (no hash tables, no k-means fit), so it is
   * exactly oracle-able end to end.
   *
   * Scale shape: the candidate pass moves ONLY (id, packed words) —
   * 8·ceil(dims/64) bytes per row instead of 8·dims — through the
   * broadcast-queries × corpus compare; float vectors are fetched by
   * a candidate-keyed join only for the rerank set (the LSH
   * semi-join-then-fetch shape). The compare is still O(|q|·N) like
   * [[bruteForceTopK]] — binary quantization cuts the constant
   * (memory traffic and a popcount vs a 64-term FMA), not the
   * asymptote — so its 100 TB role is the query-batch lookup /
   * rescoring layer; for self-join near-dup at corpus scale, band the
   * packed words through LSH instead.
   */
  def binaryTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, dims: Int,
                 k: Int, rerank: Int = 96,
                 rerankFrac: Double = 0.0): DataFrame = {
    require(rerank >= k, "rerank candidate set must be at least k")
    require(rerankFrac >= 0.0 && rerankFrac <= 1.0, "rerankFrac must be in [0, 1]")
    // null vectors are not candidates: signPack would fold them to
    // all-zero sign words that compete in the Hamming coarse pass and
    // crowd out real survivors (and the persisted-index twin drops
    // them at build time — the row-exact equivalence needs both sides
    // to agree)
    val q0 = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val c0 = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
    val qb = q0.select(col("qid"), signPack(col("qv"), dims).as("qbits"))
    val cb = c0.select(col("nid"), signPack(col("nv"), dims).as("nbits"))
    val coarse = broadcast(qb).crossJoin(cb)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        hammingDist(col("qbits"), col("nbits")).as("ham"))
    // Hamming discrimination at a fixed word width does NOT sharpen as
    // the corpus grows, so a fixed absolute rerank dilutes: recall@3
    // held at 0.87 on 500-vector corpora but fell to 0.67 at 2000 with
    // rerank=96 (r12 RECALL artifact). `rerankFrac` keeps the reranked
    // FRACTION constant — the effective candidate count is
    // max(rerank, ceil(frac·N)), with N read from a count window over
    // the same qid partition the ranking already shuffles on (no extra
    // pass, no collect).
    val wc = Window.partitionBy(col("qid")).orderBy(col("ham"), col("nid"))
    val effRerank = // full-frame count on wc's own spec: one WindowExec
      if (rerankFrac <= 0.0) lit(rerank)
      else greatest(lit(rerank),
        ceil(count(lit(1)).over(wc.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)) * lit(rerankFrac))
          .cast("int"))
    val cand = coarse.withColumn("rr", row_number().over(wc))
      .withColumn("_eff_rerank", effRerank) // window exprs can't sit in a filter
      .filter(col("rr") <= col("_eff_rerank"))
      .select(col("qid"), col("nid"), col("ham"))
    val scored = cand
      .join(q0.withColumn("qn", norm(col("qv"))), "qid")
      .join(c0.withColumn("nn", norm(col("nv"))), "nid")
      .select(col("qid"), col("nid"), col("ham"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cos"))
    val wk = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"), col("ham"))
  }

  /**
   * k-NN label classification from a precomputed neighbor relation:
   * each query id is assigned the majority label among its neighbors,
   * with a fully deterministic tie-break — vote count desc, then the
   * best (lowest) neighbor rank held by the voting label, then label
   * asc. `pairs` is any (qid, nid, rank, …) neighbor generator:
   * [[bruteForceTopK]] for the exact/oracled path, [[ivfLookup]] /
   * [[binaryTopK]] for the 100 TB path — the vote is the same either
   * way, which is what makes the classifier swappable onto an ANN
   * backend without touching the decision rule.
   *
   * Scale shape: `pairs` is |queries|·k rows (tiny next to the
   * corpus); the labels side is the full corpus but projected to
   * (id, label) — 12 bytes a row — and joined on the neighbor id, so
   * AQE broadcasts it for any queries batch that fits and falls back
   * to a co-partitioned shuffle of id+label (never the vectors)
   * otherwise. The vote aggregate and window share the qid key.
   */
  def knnClassifyFrom(pairs: DataFrame, labels: DataFrame,
                      idCol: String, labelCol: String): DataFrame = {
    val lbl = labels.select(col(idCol).as("nid"), col(labelCol).as("pred_label"))
    val votes = pairs.join(lbl, "nid")
      .groupBy(col("qid"), col("pred_label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("best_rank"), col("pred_label"))
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("pred_label"), col("votes"), col("best_rank"))
  }

  /** Exact k-NN classifier: brute-force neighbors + majority vote.
    * The corpus supplies both the vectors and the labels. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int): DataFrame =
    knnClassifyFrom(bruteForceTopK(queries, corpus, idCol, vecCol, k),
      corpus, idCol, labelCol)

  /**
   * ANN recall audit: per-query recall of an approximate neighbor
   * relation against the exact one — the measurement that decides
   * whether an ANN operating point ships, as a first-class relational
   * operator instead of a driver-side script (at 100 TB you audit a
   * sampled query set in-cluster; nothing collects). Inputs are any
   * two (qid, nid, …) relations at the same k; output is per-query
   * hit/exact counts and recall in integral micros. One semi-join on
   * (qid, nid) plus qid-keyed aggregates.
   */
  def recallAudit(annPairs: DataFrame, exactPairs: DataFrame): DataFrame = {
    val hits = annPairs.select(col("qid"), col("nid"))
      .join(exactPairs.select(col("qid"), col("nid")), Seq("qid", "nid"), "leftsemi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    exactPairs.groupBy(col("qid")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("recall_micro", expr("n_hits * 1000000 div n_exact"))
  }

  /**
   * Ratio-margin scoring over a top-k neighbor relation (Artetxe &
   * Schwenk 2019's margin criterion, the standard bitext-mining /
   * semantic-pair filter: raw cosine over-selects hub vectors that
   * are near EVERYTHING, so each pair's cosine is normalized by the
   * mean top-k cosine of both endpoints). Computed in exact integer
   * arithmetic: cosines quantize to micros row-locally, per-id sums
   * over exactly k micro values are integer, and
   * margin_ppm = cos_micro · 2k · 1e6 div (sum_a + sum_b) is an
   * integral division — hash-identical in any engine (no FP mean, no
   * FP divide). A margin_ppm of 1_000_000 means "exactly as close as
   * the endpoints' average neighborhood"; mined pairs are typically
   * kept at ≥ ~1.06e6.
   *
   * Requires a SELF top-k relation (every nid also appears as a qid —
   * i.e. queries == corpus), since both endpoints need a
   * neighborhood mean; pairs whose nid has no own neighborhood are
   * dropped by the inner join, making the contract visible. Scale
   * shape: input is N·k rows; the per-id sum shares the qid key with
   * the generator's own window, and the nid-side join moves only
   * (id, sum) — AQE broadcasts it below the threshold.
   */
  def marginPairs(pairs: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // The neighbor relation feeds THREE consumers (the pair rows, the
    // qid sums, the nid sums); without a persist Spark re-derives the
    // whole upstream neighbor search once per consumer — for an
    // IVF/LSH generator that triples the dominant cost (measured 4.6 s
    // vs 2.3 s for the bare IVF top-k at sf0.1). The relation is
    // |queries|·k rows of four scalars — persisting it is free next to
    // recomputing the search; released by the caller's
    // CachedRelations.releaseAll() after the action.
    val cosM = CachedRelations.track(
      pairs.select(col("qid"), col("nid"), col("rank"),
        floor(col("cos") * lit(1e6) + lit(0.5)).cast("long").as("cos_micro"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sums = cosM.groupBy(col("qid")).agg(sum(col("cos_micro")).as("nbr_sum"))
    cosM
      .join(sums.select(col("qid"), col("nbr_sum").as("sum_q")), "qid")
      .join(sums.select(col("qid").as("nid"), col("nbr_sum").as("sum_n")), "nid")
      // a non-positive neighborhood-mean denominator means the pair
      // sits in an anti-correlated region where the ratio margin is
      // meaningless (and engines disagree on x div 0) — drop, visibly
      .filter(col("sum_q") + col("sum_n") > 0)
      .select(col("qid"), col("nid"), col("rank"), col("cos_micro"),
        expr(s"cos_micro * ${2L * k} * 1000000 div (sum_q + sum_n)")
          .as("margin_ppm"))
  }

  /**
   * PCA projection onto the top `k` principal components. Fit is
   * DRIVER-side: power iteration with deflation on the covariance of
   * a bounded deterministic sample (the [[ivfFit]] hash-mod policy —
   * at 100 TB the eigenvector of a 20k-row sample is statistically
   * indistinguishable from the full-corpus one for triage purposes,
   * and the d×d covariance is metadata-sized). The full-corpus
   * projection is a PURE MAP against literal-inlined component
   * vectors (`score_j = vec_dot(v, w_j) − w_j·μ`, the centering
   * constant folded at plan time) — zero shuffle, zero broadcast
   * state. Components sign-normalize on their largest-|coordinate|
   * entry, so reruns and repartitions are bit-identical.
   *
   * The classic uses downstream: variance triage (is the embedding
   * space collapsing?), 2-D corpus maps, decorrelation before
   * quantization ([[randomProjection]] is the data-oblivious cousin).
   */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String, k: Int = 2,
                 maxFitVectors: Long = 20000L, iters: Int = 50): DataFrame = {
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val estBytes = v.queryExecution.optimizedPlan.stats.sizeInBytes
    val estRows = (estBytes / BigInt(512L)).toLong.max(1L)
    val fitSet =
      if (estRows <= maxFitVectors) v
      else v.filter(pmod(xxhash64(col("id")), lit(estRows / maxFitVectors + 1)) === 0)
    // id-sorted accumulation: a bare collect returns partition order,
    // and FP summation order would leak into the eigenvectors (ulp
    // drift across repartitions — observed in the spec before the sort)
    val sample = fitSet.select(col("id"), col("v")).collect()
      .sortBy(_.get(0).toString)
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "pcaProject: empty input")
    val d = sample.head.length
    val n = sample.length
    val mean = Array.tabulate(d)(i => sample.map(_(i)).sum / n)
    // population covariance of the centered sample
    val cov = Array.ofDim[Double](d, d)
    sample.foreach { x =>
      var i = 0
      while (i < d) {
        val xi = x(i) - mean(i)
        var j = i
        while (j < d) { cov(i)(j) += xi * (x(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until d; j <- i until d) {
      cov(i)(j) /= n; cov(j)(i) = cov(i)(j)
    }
    def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * x(j)).sum)
    val comps = Array.ofDim[Double](k, d)
    for (c <- 0 until k) {
      var w = Array.fill(d)(1.0 / math.sqrt(d))
      var it = 0
      var live = true
      while (it < iters && live) {
        val aw = matVec(cov, w)
        val nrm = math.sqrt(aw.map(x => x * x).sum)
        if (nrm < 1e-12) live = false // degenerate direction: keep w
        else w = aw.map(_ / nrm)
        it += 1
      }
      // deterministic sign: largest-|coordinate| entry positive
      val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
      if (w(pivot) < 0) w = w.map(-_)
      comps(c) = w
      // deflate: cov -= lambda w w^T (lambda = w^T cov w)
      val cw = matVec(cov, w)
      val lambda = (0 until d).map(i => w(i) * cw(i)).sum
      for (i <- 0 until d; j <- 0 until d) cov(i)(j) -= lambda * w(i) * w(j)
    }
    val scores = comps.zipWithIndex.map { case (w, c) =>
      val centerConst = (0 until d).map(i => w(i) * mean(i)).sum
      (dot(col("v"), lit(w)) - lit(centerConst))
        .as(s"pc${c + 1}")
    }
    v.select(col("id") +: scores.toIndexedSeq: _*)
  }
}
