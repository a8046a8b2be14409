package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) in exact
  * integer arithmetic — the mergeable register sketch next to the
  * engine's KMV (`functions.KmvDistinct`). 64 registers; register j
  * holds the max leading-zero rank of the 26 md5 bits below the 6
  * bucket bits; the harmonic denominator Σ2^(−M[j]) is carried scaled
  * by 2⁴⁰ so the estimate is one integer division, and the
  * small-range fallback is linear counting m·ln(m/V) through the
  * FixedPoint table ln. Deterministic md5 hashing makes the estimate
  * bit-reproducible on any engine and any partitioning.
  *
  * Scale shape: one map-side-combining (group, bucket) max-agg — the
  * shuffle carries ≤ 64 rows per group whatever the corpus size, and
  * registers merge by MAX, so per-shard sketches fold into corpus
  * sketches without re-reading anything (the parity-half merge law is
  * emitted as a column and hash-verified by q447).
  */
object Sketches {

  /** α₆₄·64²·10³, α_m = 0.7213/(1 + 1.079/m) — pinned literal shared
    * by the Spark plan and the DuckDB oracle. */
  val AlphaM2Milli = 2905461L

  /** 2⁴⁰ — the harmonic-denominator scale. */
  val DenomScale = 1099511627776L

  /** Per-group HLL distinct estimate over a string value column.
    * Returns one row per group: n_present (non-zero registers),
    * v_zero, est_raw (harmonic estimator), est_lc (linear counting,
    * null when no zero registers), est (the standard selection: LC
    * when zero registers exist and the raw estimate is ≤ 2.5m), and
    * merge_ok — the register merge law checked in-query (max of
    * hash-parity half-sketches == full sketch). */
  def hllEstimate(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val reg = df
      .select(col(groupCol), Sampling.hashLong(col(valCol)).as("__h"))
      .select(col(groupCol), expr("__h div 67108864").as("__bucket"),
        expr("__h % 67108864").as("__rest"), expr("__h % 2").as("__par"))
      .withColumn("__rank", when(col("__rest") === 0, lit(27L))
        .otherwise(lit(27L) - length(bin(col("__rest"))).cast("long")))
    val regs = reg.groupBy(col(groupCol), col("__bucket"))
      .agg(max("__rank").as("__m"),
        max(when(col("__par") === 0, col("__rank"))).as("__me"),
        max(when(col("__par") === 1, col("__rank"))).as("__mo"))
      .withColumn("__mm", greatest(coalesce(col("__me"), lit(0L)),
        coalesce(col("__mo"), lit(0L))))
    val lc = FixedPoint.sparkLnMicroFp20(
      FixedPoint.sparkRatioFp20("(64 - v_zero)", "v_zero"))
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(1L, CAST(40 - __m AS INT))")).as("__dp"),
        min((col("__m") === col("__mm")).cast("long")).as("__mok"))
      .withColumn("v_zero", lit(64L) - col("n_present"))
      .withColumn("denom", col("__dp") + col("v_zero") * lit(DenomScale))
      .withColumn("est_raw",
        expr(s"($AlphaM2Milli * $DenomScale) div (1000 * denom)"))
      .withColumn("est_lc",
        when(col("v_zero") > 0, expr(s"(64 * $lc) div 1000000")))
      .withColumn("est", when(col("v_zero") > 0 && col("est_raw") <= 160,
        col("est_lc")).otherwise(col("est_raw")))
      .withColumn("merge_ok", col("__mok") === 1)
      .drop("__dp", "__mok", "denom")
  }
}
