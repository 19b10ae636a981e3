package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fellegi–Sunter probabilistic record linkage (1969): candidate pairs
 * from a blocking key are scored by Σ over fields of the log-odds
 * agreement weight — ln(m/u) when the field agrees, ln((1−m)/(1−u))
 * when it disagrees, 0 when either side is missing — where m/u are
 * the caller's match/non-match agreement probabilities. Weights are
 * quantized ONCE driver-side to integral micros and inlined as
 * literals into the plan (and restated verbatim by the SQL oracle, the
 * Benford-table pattern), so scores are exact integer sums.
 * Classification: score ≥ upper → 'match', ≤ lower → 'non_match',
 * otherwise 'review' (the clerical band).
 *
 * Scale shape: the pair stage joins the two sides on the BLOCK key
 * only — per-block work is |A_b|·|B_b|, and blocks whose pair product
 * exceeds `maxBlockPairs` are dropped WHOLE (the family's skew valve;
 * an overfull block is a bad blocking key, not a workload). Field
 * comparison is row-local.
 */
object Linkage {

  def fellegiSunter(a: DataFrame, b: DataFrame, idCol: String, blockCol: String,
                    fields: Seq[String], mu: Seq[(String, Double, Double)],
                    upperMicro: Long, lowerMicro: Long,
                    maxBlockPairs: Long = 1000000L): DataFrame = {
    require(fields.nonEmpty && mu.map(_._1) == fields,
      "mu must list the same fields in the same order")
    mu.foreach { case (f, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"field $f needs 0 < u < m < 1")
    }
    val weights = mu.map { case (f, m, u) =>
      (f, math.floor(math.log(m / u) * 1e6 + 0.5).toLong,
        math.floor(math.log((1 - m) / (1 - u)) * 1e6 + 0.5).toLong)
    }
    def side(df: DataFrame, suffix: String) = df.select(
      (col(idCol).as(s"id_$suffix") +: col(blockCol).as("_blk") +:
        fields.map(f => col(f).as(s"${f}_$suffix"))): _*)
    val aa = side(a, "a")
    val bb = side(b, "b")
    val ca = aa.groupBy(col("_blk")).agg(count(lit(1)).as("_na"))
    val cb = bb.groupBy(col("_blk")).agg(count(lit(1)).as("_nb"))
    val okBlocks = ca.join(cb, "_blk")
      .filter(col("_na") * col("_nb") <= maxBlockPairs)
      .select(col("_blk"))
    val score: Column = weights.map { case (f, agreeW, disW) =>
      val fa = col(s"${f}_a"); val fb = col(s"${f}_b")
      when(fa.isNull || fb.isNull, 0L)
        .when(fa === fb, agreeW)
        .otherwise(disW)
    }.reduce(_ + _)
    aa.join(broadcast(okBlocks), "_blk")
      .join(bb, "_blk")
      .withColumn("score_micro", score)
      .withColumn("verdict",
        when(col("score_micro") >= upperMicro, "match")
          .when(col("score_micro") <= lowerMicro, "non_match")
          .otherwise("review"))
      .select(col("id_a"), col("id_b"), col("score_micro"), col("verdict"))
  }

  /** The quantized micro weights (agree, disagree) per field — for
    * oracles/specs to restate the same literals. */
  def weightTable(mu: Seq[(String, Double, Double)]): Seq[(String, Long, Long)] =
    mu.map { case (f, m, u) =>
      (f, math.floor(math.log(m / u) * 1e6 + 0.5).toLong,
        math.floor(math.log((1 - m) / (1 - u)) * 1e6 + 0.5).toLong)
    }
}
