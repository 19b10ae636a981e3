package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Exact descriptive statistics: Pearson correlation matrix and per-group
 * OLS linear fit.
 *
 * Cross-engine exactness (the repo's standard recipe): every input value
 * quantizes to an INTEGER at a fixed decimal scale (cast through
 * DECIMAL(18,s), then ×10^s → DECIMAL(38,0)), all cross-row sums
 * accumulate in DECIMAL(38,0) (exact, order-independent — a double
 * Kahan-less sum would be partition-order dependent), and only the
 * CLOSING formula runs in IEEE double with an expression tree the SQL
 * oracle states verbatim, so the doubles are bit-identical cross-engine.
 *
 * Scale shape: ONE map-side-combined global aggregate over the data
 * (every moment sum in a single pass), then row-local closing arithmetic
 * on the 1-row (or per-group) result. No second scan, no window, no
 * driver collect. Head-room: micro values are ~1e9, squares ~1e18, and
 * DECIMAL(38,0) holds ~1e38 — 1e12 rows (100 TB-ish) of cross-moment
 * sums stay exact with 2 digits to spare. At a larger scale or coarser
 * inputs, lower `scale`.
 */
object Stats {

  /** value → exact integer units at 10^scale (DECIMAL(38,0)). */
  private def micros(c: Column, scale: Int): Column =
    (c.cast(s"decimal(18,$scale)") * pow10(scale)).cast("decimal(38,0)")

  private def pow10(scale: Int): Column =
    lit(BigDecimal(10).pow(scale).toBigInt.toString).cast("decimal(18,0)")

  /**
   * Pairwise Pearson correlation over `cols`, long format
   * (col_x < col_y by the given ordering): `col_x, col_y, n, corr`.
   *
   * r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²)); the micro
   * scale cancels. The discriminants are exact integers ≥ 0
   * (Cauchy–Schwarz), so the sqrt never sees a negative rounding
   * artifact. A zero-variance column yields NULL (stated CASE, not an
   * engine-specific 0-division disposition). Rows with a NULL in ANY
   * requested column are excluded globally (one stated n for every
   * pair, as a statistics package's complete-case "listwise deletion").
   */
  def correlationMatrix(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val complete = df.na.drop(cols)
    val m = cols.map(c => c -> micros(col(c), scale)).toMap
    val firstMoments = cols.flatMap { c =>
      Seq(sum(m(c)).as(s"s_$c"), sum(m(c) * m(c)).as(s"s_${c}_${c}"))
    }
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val crossMoments = pairs.map { case (a, b) => sum(m(a) * m(b)).as(s"s_${a}_${b}") }
    val agg = complete.agg(count(lit(1)).as("n"),
      (firstMoments ++ crossMoments): _*)
    val nD = col("n").cast(DoubleType)
    def corrOf(a: String, b: String): Column = {
      val sx = col(s"s_$a").cast(DoubleType); val sy = col(s"s_$b").cast(DoubleType)
      val sxx = col(s"s_${a}_${a}").cast(DoubleType)
      val syy = col(s"s_${b}_${b}").cast(DoubleType)
      val sxy = col(s"s_${a}_${b}").cast(DoubleType)
      val dx = nD * sxx - sx * sx
      val dy = nD * syy - sy * sy
      when(dx > lit(0.0) && dy > lit(0.0),
        (nD * sxy - sx * sy) / (sqrt(dx) * sqrt(dy)))
    }
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"), col("n").as("n"),
        corrOf(a, b).as("corr"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /**
   * Per-group simple OLS fit of `yCol` on `xCol`:
   * `byCols…, n, slope, intercept` with
   * slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) and
   * intercept = (Sy − slope·Sx)/(n·10^scale) — the sums are in micro
   * units, and the unit factor cancels in the slope (micro·micro over
   * micro·micro) but not in the intercept (plain y units), hence the
   * single stated 10^scale division. Zero x-variance → NULL fit.
   * One map-side-combined shuffle on the group keys.
   */
  def olsFit(df: DataFrame, xCol: String, yCol: String,
             byCols: Seq[String], scale: Int = 4): DataFrame = {
    val complete = df.na.drop(Seq(xCol, yCol))
    val mx = micros(col(xCol), scale)
    val my = micros(col(yCol), scale)
    val agg = complete.groupBy(byCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(mx).as("sx"), sum(my).as("sy"),
        sum(mx * mx).as("sxx"), sum(mx * my).as("sxy"))
    val nD = col("n").cast(DoubleType)
    val sx = col("sx").cast(DoubleType); val sy = col("sy").cast(DoubleType)
    val sxx = col("sxx").cast(DoubleType); val sxy = col("sxy").cast(DoubleType)
    val dx = nD * sxx - sx * sx
    val slope = when(dx > lit(0.0), (nD * sxy - sx * sy) / dx)
    agg
      .withColumn("slope", slope)
      .withColumn("intercept",
        (sy - col("slope") * sx) / (nD * pow10(scale).cast(DoubleType)))
      .select(byCols.map(col) ++ Seq(col("n"), col("slope"), col("intercept")): _*)
  }

  /**
   * Equi-width value histogram: `nBuckets` buckets spanning the
   * GLOBAL [min, max] of `valueCol` (micro-integer arithmetic — FP
   * width computation flips bucket edges between engines; integral
   * `div` never does). Bucket of value m is
   * `min(nBuckets−1, (m−mn)·nBuckets div span)` with span =
   * mx−mn+1 micros, so the top edge lands in the last bucket and a
   * constant column degenerates to bucket 0. Bounds are emitted in
   * micros (`lo_micro` inclusive, `hi_micro` exclusive). The 1-row
   * min/max aggregate rides a broadcast; counting is one
   * map-side-combined shuffle on (group, bucket). Groups share the
   * global edges — that is what makes the per-group histograms
   * comparable side by side.
   */
  def valueHistogram(df: DataFrame, valueCol: String, byCols: Seq[String] = Nil,
                     nBuckets: Int = 20, scale: Int = 4): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("_m", micros(col(valueCol), scale).cast("long"))
    val bounds = base.agg(min(col("_m")).as("_mn"), max(col("_m")).as("_mx"))
    base.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(lit(nBuckets - 1), expr(s"(_m - _mn) * $nBuckets div (_mx - _mn + 1)"))
          .cast("int"))
      .groupBy(byCols.map(col) ++ Seq(col("bucket"), col("_mn"), col("_mx")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_micro", expr(s"_mn + bucket * (_mx - _mn + 1) div $nBuckets"))
      .withColumn("hi_micro", expr(s"_mn + (bucket + 1) * (_mx - _mn + 1) div $nBuckets"))
      .select(byCols.map(col) ++ Seq(col("bucket"), col("n"),
        col("lo_micro"), col("hi_micro")): _*)
  }

  /**
   * Mean imputation: NULLs in `valueCol` replaced by the per-group
   * exact integral-micro FLOOR mean. Spark's `div` truncates toward
   * zero while DuckDB's `//` floors, so a naked `div` diverges by one
   * micro on negative-sum groups; the pmod adjustment below
   * (`(s − pmod(s, n)) div n`, exact floor for n > 0) keeps the two
   * engines identical for any sign. The imputed value is the micro
   * mean divided back once, a single stated IEEE division. Groups
   * with no observed value keep NULL (nothing to impute from). The
   * group-mean relation is group-cardinality small and broadcast; the
   * data is never shuffled.
   */
  def imputeMean(df: DataFrame, valueCol: String, byCols: Seq[String],
                 scale: Int = 4): DataFrame = {
    val m = micros(col(valueCol), scale)
    val means = df.filter(col(valueCol).isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(sum(m).cast("decimal(38,0)").as("_sm"), count(lit(1)).as("_nv"))
      .withColumn("_mean_micro", expr(
        "cast((_sm - pmod(_sm, cast(_nv as decimal(38,0)))) div _nv as bigint)"))
      .select(byCols.map(col) :+ col("_mean_micro"): _*)
    df.join(broadcast(means), byCols, "left")
      .withColumn(valueCol,
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(col("_mean_micro").cast(DoubleType) / pow10(scale).cast(DoubleType)))
      .drop("_mean_micro")
  }

  /**
   * Winsorization at mean ± `sigmas`·σ per group: values outside the
   * band clamp to the bound. Mean and σ come from the exact integral
   * moment sums (population variance, the n divisor); the bounds are
   * IEEE doubles computed by a stated expression tree —
   * mean ± k·sqrt((n·Sxx − Sx²)/n²) in MICRO units, compared against
   * the micro value cast to double, so both engines clamp the same
   * rows. Output adds `<valueCol>_w` (clamped, in original units) and
   * `was_clipped`. Group stats broadcast; no data shuffle.
   */
  def winsorize(df: DataFrame, valueCol: String, byCols: Seq[String],
                sigmas: Double = 3.0, scale: Int = 4): DataFrame = {
    val m = micros(col(valueCol), scale)
    val stats = df.filter(col(valueCol).isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(m).as("_sx"), sum(m * m).as("_sxx"))
      .withColumn("_mean", col("_sx").cast(DoubleType) / col("_n").cast(DoubleType))
      .withColumn("_sd", sqrt(
        (col("_n").cast(DoubleType) * col("_sxx").cast(DoubleType) -
          col("_sx").cast(DoubleType) * col("_sx").cast(DoubleType)) /
          (col("_n").cast(DoubleType) * col("_n").cast(DoubleType))))
      .withColumn("_lo", col("_mean") - lit(sigmas) * col("_sd"))
      .withColumn("_hi", col("_mean") + lit(sigmas) * col("_sd"))
      .select(byCols.map(col) ++ Seq(col("_lo"), col("_hi")): _*)
    val mv = col("_mv").cast(DoubleType)
    df.withColumn("_mv", m.cast("long"))
      .join(broadcast(stats), byCols, "left")
      .withColumn("was_clipped",
        col(valueCol).isNotNull && (mv < col("_lo") || mv > col("_hi")))
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null).cast(DoubleType))
          .when(mv < col("_lo"), col("_lo") / pow10(scale).cast(DoubleType))
          .when(mv > col("_hi"), col("_hi") / pow10(scale).cast(DoubleType))
          .otherwise(col(valueCol)))
      .drop("_mv", "_lo", "_hi")
  }

  /**
   * Contingency-table chi-square independence report between two
   * categorical columns: per observed cell, the count, the expected
   * count under independence in micros (row_tot·col_tot·10⁶ div N),
   * and the cell's chi-square contribution in micros via the
   * integer-safe identity (o−e)²/e = (o·N − rt·ct)² / (N·rt·ct) —
   * numerator and denominator in DECIMAL(38,0) (HUGEINT in the DuckDB
   * twin), exact while row totals stay ≲ 3·10⁹ (beyond that,
   * pre-bucket the categories; the quadratic magnitude is inherent to
   * the statistic, not the implementation). `chi2_micro_total`
   * repeats the full-table statistic on every row; the closing window
   * runs over the CELL relation (category-cardinality sized), never
   * the data.
   *
   * Scale shape: one map-side-combined shuffle for cell counts; row
   * and column marginals derive from the cell relation (no second
   * data scan); marginal joins broadcast.
   */
  def crosstabChi2(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).as("row_val"), col(colCol).as("col_val"))
      .agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy(col("row_val")).agg(sum(col("n")).as("rt"))
    val colTot = cells.groupBy(col("col_val")).agg(sum(col("n")).as("ct"))
    val total = cells.agg(sum(col("n")).as("nn"))
    // corpus-wide windows ride the CELL relation (distinct row×col
    // values — bounded small); the constant pmod partition states the
    // single-partition intent (and spares the WindowExec warning)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("n"), lit(1)))
    cells
      .join(broadcast(rowTot), "row_val")
      .join(broadcast(colTot), "col_val")
      .crossJoin(broadcast(total))
      .withColumn("expected_micro",
        expr("cast(cast(rt as decimal(38,0)) * ct * 1000000 div nn as bigint)"))
      .withColumn("contrib_micro",
        expr("cast(cast(cast(n as decimal(38,0)) * nn - cast(rt as decimal(38,0)) * ct as decimal(38,0)) " +
          "* cast(cast(n as decimal(38,0)) * nn - cast(rt as decimal(38,0)) * ct as decimal(38,0)) " +
          "* 1000000 div (cast(nn as decimal(38,0)) * rt * ct) as bigint)"))
      .withColumn("chi2_micro_total", sum(col("contrib_micro")).over(w))
      // Cramér's V = sqrt(chi2 / (N·(min(r,c)−1))) — effect size on
      // [0,1]; stated IEEE tree over the exact integer chi2
      .withColumn("_r", size(collect_set(col("row_val")).over(w)))
      .withColumn("_c", size(collect_set(col("col_val")).over(w)))
      .withColumn("cramers_v",
        when(least(col("_r"), col("_c")) > 1,
          sqrt((col("chi2_micro_total").cast(DoubleType) / lit(1e6)) /
            (col("nn").cast(DoubleType) *
              (least(col("_r"), col("_c")) - lit(1)).cast(DoubleType)))))
      .select(col("row_val"), col("col_val"), col("n"), col("expected_micro"),
        col("contrib_micro"), col("chi2_micro_total"), col("cramers_v"))
  }

  /**
   * Two-proportion A/B significance test with an EXACT integer
   * verdict: clearing the pooled z-test at level `z` is equivalent to
   *
   *   (c1·n2 − c2·n1)²·N  >  z²·n1·n2·C·(N−C)
   *
   * (N = n1+n2, C = c1+c2 — multiply the classic statistic through by
   * its denominators), evaluated in DECIMAL(38,0)/HUGEINT, so the
   * significance verdict is bit-identical cross-engine — no FP sqrt
   * on the decision path. Rates are integral micros. Exact while
   * per-variant unit counts stay ≲ 10⁷ (the cubic-in-counts RHS is
   * inherent to the statistic; pre-scale beyond that). Unit = one
   * `keyCol` value: variant by min, converted by max over the unit's
   * rows. One unit-keyed shuffle + a 2-row closing fold. Exactly two
   * variants required.
   */
  def abTest(df: DataFrame, keyCol: String, variantCol: String,
             convCol: String, z: Int = 2): DataFrame = {
    val per = df.groupBy(col(keyCol))
      .agg(min(col(variantCol)).as("variant"),
        max(col(convCol).cast("int")).as("conv"))
    val v = per.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val two = v.agg(
      min(struct(col("variant"), col("n"), col("c"))).as("a"),
      max(struct(col("variant"), col("n"), col("c"))).as("b"),
      count(lit(1)).as("_nv"))
    two
      .select(col("_nv"), col("a.variant").as("variant_a"), col("a.n").as("n_a"),
        col("a.c").as("c_a"), col("b.variant").as("variant_b"), col("b.n").as("n_b"),
        col("b.c").as("c_b"))
      .withColumn("rate_a_micro", expr("c_a * 1000000 div n_a"))
      .withColumn("rate_b_micro", expr("c_b * 1000000 div n_b"))
      .withColumn("diff_micro", col("rate_a_micro") - col("rate_b_micro"))
      .withColumn("significant", expr(
        s"""_nv = 2 AND
          (cast(c_a as decimal(38,0)) * n_b - cast(c_b as decimal(38,0)) * n_a)
          * (cast(c_a as decimal(38,0)) * n_b - cast(c_b as decimal(38,0)) * n_a)
          * (n_a + n_b)
          > cast(${z.toLong * z} as decimal(38,0)) * n_a * n_b * (c_a + c_b)
            * (n_a + n_b - c_a - c_b)"""))
      .drop("_nv")
  }

  /**
   * Wilson score confidence interval per group for a boolean
   * proportion: the interval that stays sane at small n and extreme
   * rates (the normal approximation doesn't). Bounds are IEEE doubles
   * from a STATED expression tree over exact integer (c, n) — center
   * = (c + z²/2)/(n + z²), half-width = z·√(c(n−c)/n + z²/4)/(n + z²)
   * — identical cross-engine because both engines compute the same
   * tree over the same integers. One map-side-combined group shuffle.
   */
  def wilson(df: DataFrame, flagCol: String, byCols: Seq[String],
             z: Double = 2.0): DataFrame = {
    val agg = df.filter(col(flagCol).isNotNull)
      .groupBy(byCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(flagCol).cast("long")).as("c"))
    val nD = col("n").cast(DoubleType); val cD = col("c").cast(DoubleType)
    val z2 = lit(z * z)
    val center = (cD + z2 / lit(2.0)) / (nD + z2)
    val half = lit(z) * sqrt(cD * (nD - cD) / nD + z2 / lit(4.0)) / (nD + z2)
    agg
      .withColumn("rate_micro", expr("c * 1000000 div n"))
      .withColumn("wilson_lo", center - half)
      .withColumn("wilson_hi", center + half)
  }

  /**
   * EXACT ROC-AUC (Mann–Whitney U) of a score column against a binary
   * label, with average-rank tie handling, in integral micros — no
   * sampling, no trapezoids, no FP on the decision path:
   *
   *   AUC = (S2 − P(P+1)) / (2·P·N),  S2 = Σ_{positives} 2·r̄_i
   *
   * where r̄ is the average rank of the row among ties — 2r̄ is always
   * an integer (2·rank_min + ties − 1), so S2 is exact. Ranks come
   * from cumulative counts over the DISTINCT-SCORE relation (one
   * groupBy + an ordered window over score cardinality), never a
   * corpus-wide row sort: for each distinct score, rows below it give
   * rank_min, ties give the spread, positives at it weight the sum.
   * Output is one row: n_pos, n_neg, auc_micro, gini_micro (2·AUC−1).
   * Degenerate labels (P=0 or N=0) yield NULL metrics. The cumulative
   * rank counts run through [[Cumulative.runningSums]] (bucketed
   * two-level prefix sums), so even a data-sized score cardinality
   * never collapses the plan into one WindowExec task — quantizing
   * first is still the right call for statistical reasons, but it is
   * no longer load-bearing for the plan. Requires a numeric score.
   */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("s"), col(labelCol).cast("int").as("y"))
    val perScore = base.groupBy(col("s"))
      .agg(count(lit(1)).as("ties"), sum(col("y")).as("pos"))
    val enriched = Cumulative.runningSums(perScore, "s", Nil,
        Seq("_cum_ties" -> col("ties")))
      .withColumn("_below", col("_cum_ties") - col("ties"))
      // 2*avg_rank = 2*(below+1) + ties - 1; weight by positives at s
      .withColumn("_s2_part",
        col("pos").cast("decimal(38,0)") * (lit(2) * (col("_below") + 1) + col("ties") - 1))
    enriched.agg(
        sum(col("_s2_part")).as("_s2"),
        sum(col("pos")).as("n_pos"),
        (sum(col("ties")) - sum(col("pos"))).as("n_neg"))
      .withColumn("auc_micro",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("""cast((_s2 - cast(n_pos as decimal(38,0)) * (n_pos + 1)) * 1000000
            div (cast(2 as decimal(38,0)) * n_pos * n_neg) as bigint)""")))
      .withColumn("gini_micro",
        when(col("auc_micro").isNotNull, col("auc_micro") * 2 - 1000000L))
      .select(col("n_pos"), col("n_neg"), col("auc_micro"), col("gini_micro"))
  }

  /**
   * Reliability (calibration) table: scores bucketed on the global
   * [min, max] equi-width grid (the [[valueHistogram]] integer
   * arithmetic), each bin reporting its exact mean score and positive
   * rate in integral micros — the "is a 0.8 score right 80% of the
   * time" diagram as a relation. One bounds broadcast + one
   * map-side-combined bin shuffle.
   */
  def reliability(df: DataFrame, scoreCol: String, labelCol: String,
                  nBins: Int = 10, scale: Int = 4): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    require(scale >= 0 && scale <= 6, "scale must be in [0, 6] (micro output)")
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("_m", micros(col(scoreCol), scale).cast("long"))
      .withColumn("_y", col(labelCol).cast("long"))
    val bounds = base.agg(min(col("_m")).as("_mn"), max(col("_m")).as("_mx"))
    base.crossJoin(broadcast(bounds))
      .withColumn("bin",
        least(lit(nBins - 1), expr(s"(_m - _mn) * $nBins div (_mx - _mn + 1)"))
          .cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_m")).as("_sm"), sum(col("_y")).as("_sy"))
      .withColumn("mean_score_micro",
        expr(s"cast(cast(_sm as decimal(38,0)) * ${BigDecimal(10).pow(6 - scale).toBigInt} div n as bigint)"))
      .withColumn("pos_rate_micro", expr("_sy * 1000000 div n"))
      .select(col("bin"), col("n"), col("mean_score_micro"), col("pos_rate_micro"))
  }

  /**
   * Confusion matrix + precision/recall/F1 at each given threshold
   * (score >= t predicts positive), all counts and ratios exact
   * integral micros — F1 = 2·TP·10⁶ div (2·TP + FP + FN). Thresholds
   * expand row-locally before ONE map-side-combined aggregate.
   */
  def confusion(df: DataFrame, scoreCol: String, labelCol: String,
                thresholds: Seq[BigDecimal], scale: Int = 4): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("_m", micros(col(scoreCol), scale).cast("long"))
      .withColumn("_y", col(labelCol).cast("int"))
    val tLits = thresholds.map(t =>
      (t.setScale(scale, scala.math.BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(10).pow(scale)).toLongExact)
    val exploded = base.withColumn("_t",
      explode(array(tLits.map(lit): _*)))
    exploded
      .withColumn("_pred", (col("_m") >= col("_t")).cast("int"))
      .groupBy(col("_t").as("threshold_units"))
      .agg(sum(expr("_pred * _y")).as("tp"),
        sum(expr("_pred * (1 - _y)")).as("fp"),
        sum(expr("(1 - _pred) * (1 - _y)")).as("tn"),
        sum(expr("(1 - _pred) * _y")).as("fn"))
      .withColumn("precision_micro",
        when(col("tp") + col("fp") > 0, expr("tp * 1000000 div (tp + fp)")))
      .withColumn("recall_micro",
        when(col("tp") + col("fn") > 0, expr("tp * 1000000 div (tp + fn)")))
      .withColumn("f1_micro",
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 1000000 div (2 * tp + fp + fn)")))
  }

  /**
   * EXACT per-group percentiles (nearest-rank definition: the
   * smallest value whose cumulative count reaches ⌈p·n⌉) — order
   * statistics without a global row sort and without sketches:
   * the repo's distinct-value + cumulative-count machinery (AUC,
   * Kaplan-Meier) pointed at quantiles. One map-side-combined
   * (group, value) shuffle; the cumulative window rides the
   * DISTINCT-VALUE relation per group. `approx_percentile` (see
   * `quantileBuckets`) remains the one-pass-sketch alternative when
   * value cardinality is data-sized; this is the exact answer when
   * it isn't (latencies, prices, counts).
   */
  def exactPercentiles(df: DataFrame, valueCol: String, byCols: Seq[String],
                       psMicro: Seq[Long] = Seq(500000L, 950000L, 990000L),
                       scale: Int = 4): DataFrame = {
    require(psMicro.nonEmpty && psMicro.forall(p => p > 0 && p <= 1000000L),
      "percentiles must be in (0, 1e6]")
    val perValue = df.filter(col(valueCol).isNotNull)
      .withColumn("_m", micros(col(valueCol), scale).cast("long"))
      .groupBy(byCols.map(col) :+ col("_m"): _*)
      .agg(count(lit(1)).as("_cnt"))
    // Per-group cumulative counts via the bucketed two-level prefix
    // sum: stays parallel even when a group's distinct-value relation
    // is data-sized OR the group column is a constant (a literal
    // partition column constant-folds out of a window spec and the
    // plan silently collapses to one task — the q_session_percentiles
    // g='all' shape). Group totals come from an aggregate + null-safe
    // broadcast join, not a whole-partition window, for the same
    // reason.
    val cum0 = Cumulative.runningSums(perValue, "_m", Nil,
      Seq("_cum" -> col("_cnt")), partitionCols = byCols)
    val totals = perValue.groupBy(byCols.map(col): _*)
      .agg(sum(col("_cnt")).as("_n"))
      .select(byCols.map(k => col(k).as(s"_tp_$k")) :+ col("_n"): _*)
    val cum = cum0.join(broadcast(totals),
        byCols.map(k => col(k) <=> col(s"_tp_$k")).reduce(_ && _))
      .drop(byCols.map(k => s"_tp_$k"): _*)
    cum
      .withColumn("p_micro", explode(array(psMicro.map(lit): _*)))
      .withColumn("_r", expr("(_n * p_micro + 999999) div 1000000")) // ceil(n*p/1e6)
      .filter(col("_cum") >= col("_r") && col("_cum") - col("_cnt") < col("_r"))
      .withColumn("value", col("_m").cast(DoubleType) / pow10(scale).cast(DoubleType))
      .select(byCols.map(col) ++ Seq(col("p_micro"), col("_n").as("n"),
        col("_m").as("value_units"), col("value")): _*)
  }

  /**
   * Multiclass classification report: the confusion matrix in long
   * format, each cell annotated with its ACTUAL class recall, its
   * PREDICTED class precision, and the overall accuracy — every
   * ratio integral micros over exact counts. The closing windows run
   * on the label-cardinality cell relation; the one data-volume step
   * is the id-keyed prediction/truth join.
   */
  def multiclassReport(pred: DataFrame, predIdCol: String, predLabelCol: String,
                       truth: DataFrame, truthIdCol: String,
                       truthLabelCol: String): DataFrame = {
    val j = truth.select(col(truthIdCol).as("_id"), col(truthLabelCol).as("actual"))
      .join(pred.select(col(predIdCol).as("_id"), col(predLabelCol).as("predicted")), "_id")
    val cells = j.groupBy(col("actual"), col("predicted")).agg(count(lit(1)).as("n"))
    // label-cardinality cell relation — single partition is the intent
    // (constant pmod partition, not a bare spec, so WindowExec is quiet)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("n"), lit(1)))
    val wA = org.apache.spark.sql.expressions.Window.partitionBy(col("actual"))
    val wP = org.apache.spark.sql.expressions.Window.partitionBy(col("predicted"))
    val diag = sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L))
    cells
      .withColumn("_rt", sum(col("n")).over(wA))
      .withColumn("_ct", sum(col("n")).over(wP))
      .withColumn("_tot", sum(col("n")).over(wAll))
      .withColumn("_diag_a", diag.over(wA))
      .withColumn("_diag_p", diag.over(wP))
      .withColumn("_diag_all", diag.over(wAll))
      .withColumn("recall_micro", expr("_diag_a * 1000000 div _rt"))
      .withColumn("precision_micro",
        when(col("_ct") > 0, expr("_diag_p * 1000000 div _ct")))
      .withColumn("accuracy_micro", expr("_diag_all * 1000000 div _tot"))
      .select(col("actual"), col("predicted"), col("n"),
        col("recall_micro"), col("precision_micro"), col("accuracy_micro"))
  }

  /**
   * Revenue concentration: exact Gini coefficient and top-decile
   * share over per-key value sums —
   * G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with x sorted ascending
   * (key-asc ties), all in DECIMAL(38,0) micro units with one
   * integral division at the end; the top-10% share is the revenue of
   * the ⌈n/10⌉ highest keys over the total. One data-volume shuffle
   * (per-key sums); the rank window rides the KEY relation (the
   * AUC/percentile stance — keys ≪ events). Negative per-key sums
   * are allowed (refunds); Gini is then the generalized (possibly
   * >1) form. `total_micro` is emitted as DOUBLE for oracle parity:
   * the cast is exact only up to 2^53 micros (~9·10⁹ currency
   * units); beyond that both engines round identically (same IEEE
   * decimal→double), so they still agree — but the column is then a
   * rounded total, not an exact one. gini_micro is unaffected (its
   * division happens on the exact DECIMAL values).
   */
  def concentration(df: DataFrame, keyCol: String, valueCol: String,
                    scale: Int = 4): DataFrame = {
    val perKey = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("_k"))
      .agg(sum(micros(col(valueCol), scale)).cast("decimal(38,0)").as("_x"))
    // Ascending rank i over (sum, key) — unique keys make the inclusive
    // running COUNT equal to row_number, so the rank comes from the
    // bucketed two-level prefix sum instead of a single-partition
    // row_number window over the (possibly data-sized) key relation.
    // The double cast that buckets _x is monotone; (_x, _k) ties stay
    // inside one bucket where the window's tiebreak resolves them.
    val ranked = Cumulative.runningSums(perKey, "_x", Seq("_k"),
      Seq("_i" -> lit(1L)))
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("_x")).as("_sx"),
        sum(col("_x") * col("_i")).as("_six"))
      .withColumn("total_micro",
        expr(s"cast(_sx * ${BigDecimal(10).pow(6 - scale).toBigInt} as decimal(38,0))"))
      .withColumn("gini_micro",
        when(col("_sx") > 0, expr(
          "cast((cast(2 as decimal(38,0)) * _six - (n_keys + 1) * _sx) * 1000000 " +
            "div (cast(n_keys as decimal(38,0)) * _sx) as bigint)")))
      .select(col("n_keys"), col("total_micro").cast("double").as("total_micro"),
        col("gini_micro"))
  }

  /** Expected Benford share of leading digit d, in micros (quantized
    * once here; the SQL oracle inlines the SAME literals). */
  val benfordMicro: Map[Int, Long] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong).toMap

  /**
   * Benford's-law first-digit audit per group: observed leading-digit
   * counts and shares vs the log10(1+1/d) expectation — the classic
   * fabricated-numbers / pipeline-corruption screen for financial-ish
   * columns. The leading digit comes from INTEGER arithmetic on the
   * micro value (a macro-expanded magnitude CASE, never a string
   * render or FP log — both engine-divergent at boundaries); shares
   * are integral micros over the group total. Zero/null values are
   * excluded (no leading digit). One map-side-combined shuffle; the
   * per-group share window runs on the 9-row-per-group aggregate.
   */
  def benford(df: DataFrame, valueCol: String, byCols: Seq[String],
              scale: Int = 4): DataFrame = {
    val pow = (0 to 18).map(i => BigInt(10).pow(i).toLong)
    val m = micros(abs(col(valueCol)), scale).cast("long")
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("_m", m).filter(col("_m") > 0)
    val digit = (17 to 1 by -1).foldLeft(when(lit(false), lit(0L))) { (acc, i) =>
      acc.when(col("_m") >= pow(i), expr(s"_m div ${pow(i)}"))
    }.otherwise(col("_m"))
    val counts = base.withColumn("digit", digit.cast("int"))
      .groupBy(byCols.map(col) :+ col("digit"): _*)
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(byCols.map(col): _*)
    val expected = benfordMicro.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (d, p)) =>
        acc.when(col("digit") === d, p)
      }.otherwise(lit(0L))
    counts
      .withColumn("_tot", sum(col("n")).over(w))
      .withColumn("share_micro", expr("n * 1000000 div _tot"))
      .withColumn("benford_micro", expected)
      .withColumn("dev_micro", abs(col("share_micro") - col("benford_micro")))
      .select(byCols.map(col) ++ Seq(col("digit"), col("n"), col("share_micro"),
        col("benford_micro"), col("dev_micro")): _*)
  }
}
