package graft.queries

import graft.Tables._
import graft.ops.FixedPoint
import org.apache.spark.sql.functions._

/** Round-9 twenty-sixth batch: causal weighting (IPW), count
  * overdispersion, and Bloom-filter sizing.
  */
object QueriesRound9z {

  val defs: Seq[QueryDef] = Seq(

    // ---- q533: inverse-propensity-weighted effect --------------------------------
    // q524 adjusts the ODDS RATIO by stratification; IPW answers the
    // additive question — the lang-adjusted pass-RATE difference —
    // by weighting each doc with 1/P(its exposure | lang). Exact
    // rationals per stratum (weight n_s/e_s), combined over the
    // common denominator: ATE_ppm = Σ_s [a_s·n_s/e_s] / N −
    // Σ_s [c_s·n_s/u_s] / N, every division a cross-multiplied
    // floor at ppm scale only. Beside it the UNWEIGHTED difference,
    // so the confounding correction is visible in one row.
    QueryDef("q533_ipw_effect",
      (s, d) => {
        val cells = documents(s, d).select(col("lang"),
          (expr("CAST(substring(source, 4, 10) AS INT) % 2") === 0)
            .as("exposed"),
          (col("n_chars") >= 300).as("pass"))
          .groupBy("lang")
          .agg(
            sum(when(col("exposed") && col("pass"), 1L).otherwise(0L)).as("a"),
            sum(when(col("exposed"), 1L).otherwise(0L)).as("e"),
            sum(when(!col("exposed") && col("pass"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("exposed"), 1L).otherwise(0L)).as("u"))
          .withColumn("ns", expr("e + u"))
        // per-stratum weighted pass mass in ppm of N (floor once per
        // stratum; e/u > 0 on this corpus — greatest() guards anyway)
        val agg = cells.agg(
          sum("ns").as("n"),
          sum(expr("a * ns * 1000000 div greatest(e, 1L)")).as("wt_t"),
          sum(expr("c * ns * 1000000 div greatest(u, 1L)")).as("wt_c"),
          sum("a").as("ta"), sum("e").as("te"),
          sum("c").as("tc"), sum("u").as("tu"))
        agg.select(col("n"),
          expr("wt_t div n").as("ipw_treated_ppm"),
          expr("wt_c div n").as("ipw_control_ppm"),
          expr("wt_t div n - wt_c div n").as("ipw_ate_ppm"),
          expr("ta * 1000000 div te - tc * 1000000 div tu")
            .as("naive_diff_ppm"))
      },
      Some("""WITH base AS (SELECT lang,
        |    CAST(substring(source, 4, 10) AS INTEGER) % 2 = 0 AS exposed,
        |    n_chars >= 300 AS pass FROM documents),
        |cells AS (SELECT lang,
        |    CAST(sum(CASE WHEN exposed AND pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN exposed THEN 1 ELSE 0 END) AS BIGINT) AS e,
        |    CAST(sum(CASE WHEN NOT exposed AND pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT exposed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS u
        |  FROM base GROUP BY 1),
        |cs AS (SELECT a, e, c, u, e + u AS ns FROM cells),
        |agg AS (SELECT CAST(sum(ns) AS BIGINT) AS n,
        |    CAST(sum(a * ns * 1000000 // greatest(e, 1)) AS BIGINT) AS wt_t,
        |    CAST(sum(c * ns * 1000000 // greatest(u, 1)) AS BIGINT) AS wt_c,
        |    CAST(sum(a) AS BIGINT) AS ta, CAST(sum(e) AS BIGINT) AS te,
        |    CAST(sum(c) AS BIGINT) AS tc, CAST(sum(u) AS BIGINT) AS tu
        |  FROM cs)
        |SELECT n, wt_t // n AS ipw_treated_ppm,
        |  wt_c // n AS ipw_control_ppm,
        |  wt_t // n - wt_c // n AS ipw_ate_ppm,
        |  ta * 1000000 // te - tc * 1000000 // tu AS naive_diff_ppm
        |FROM agg""".stripMargin)),

    // ---- q534: index of dispersion (overdispersion check) ------------------------
    // Count-model sanity for traffic data: variance-to-mean ratio of
    // per-user daily event counts, per event type. Poisson traffic
    // shows D ≈ 1; D ≫ 1 (bursty users, bots) breaks every
    // rate-threshold monitor calibrated on Poisson assumptions. Kept
    // exact: D_milli = n·Σx² − (Σx)² over (n−1)·Σx, cross-multiplied
    // BIGINTs, one scan for the per-(type,user,day) counts and one
    // tiny agg per type.
    QueryDef("q534_dispersion_index",
      (s, d) => {
        val cnt = events(s, d)
          .groupBy(col("event_type"), col("user_id"),
            dayofmonth(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        cnt.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(expr("x * x")).as("sx2"))
          .select(col("event_type"), col("n"), col("sx"),
            expr("(n * sx2 - sx * sx) * 1000 div ((n - 1) * sx)")
              .as("dispersion_milli"))
          .orderBy("event_type")
      },
      Some("""WITH c AS (SELECT event_type, user_id, day(ts) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2, 3),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM c GROUP BY 1)
        |SELECT event_type, n, sx,
        |  (n * sx2 - sx * sx) * 1000 // ((n - 1) * sx)
        |    AS dispersion_milli
        |FROM a ORDER BY event_type""".stripMargin)),

    // ---- q535: Bloom-filter sizing planner ----------------------------------------
    // The planner beside the measured gate (q292 measures a BUILT
    // filter's FP rate; this sizes one BEFORE building): for each
    // source's distinct-token count n and target FP 1%/0.1%, the
    // optimal bits m = ceil(n·ln(1/p)/ln²2) and hash count
    // k = floor(m/n·ln2) — floor, not round: both engines and the
    // spec pin the floored (m·693147 div (n·10⁶)) form, which
    // under-counts k by at most 1 vs the textbook rounding (the FP
    // rate moves by < 2× at these k, a planner-grade tolerance) —
    // all on integer micro-nats printed from
    // the SAME FixedPoint table both engines share (ln(100) and
    // ln(1000) folded at build time from log2MicroLong — one source
    // of truth, the q460 discipline), so the whole plan is
    // hash-stable integer arithmetic.
    QueryDef("q535_bloom_sizing",
      (s, d) => {
        // ln(1/p) in micro-nats, computed ONCE in Scala from the
        // shared table and printed into both engines
        val ln100 = FixedPoint.lnMicroLong(
          FixedPoint.ratioFp20Long(99, 1)) // ln(100)
        val ln1000 = FixedPoint.lnMicroLong(
          FixedPoint.ratioFp20Long(999, 1)) // ln(1000)
        val ln2sq = 480453L // floor(ln²2 · 1e6): 693147² div 1e6
        val nTok = documents(s, d)
          .select(col("source"),
            explode(graft.ops.Text.tokens(col("text"))).as("tok"))
          .groupBy("source").agg(countDistinct("tok").as("n"))
        def plan(lnp: Long, tag: String) = Seq(
          expr(s"(n * $lnp + $ln2sq - 1) div $ln2sq").as(s"m_bits_$tag"),
          expr(s"((n * $lnp + $ln2sq - 1) div $ln2sq) * 693147" +
            s" div (n * 1000000)").as(s"k_$tag"))
        nTok.select(
          (col("source") +: col("n").as("n_distinct") +:
            (plan(ln100, "fp1") ++ plan(ln1000, "fp01"))): _*)
          .orderBy("source")
      },
      Some {
        val ln100 = FixedPoint.lnMicroLong(FixedPoint.ratioFp20Long(99, 1))
        val ln1000 = FixedPoint.lnMicroLong(FixedPoint.ratioFp20Long(999, 1))
        val ln2sq = 480453L
        def plan(lnp: Long, tag: String) =
          s"""(n * $lnp + $ln2sq - 1) // $ln2sq AS m_bits_$tag,
             |  ((n * $lnp + $ln2sq - 1) // $ln2sq) * 693147
             |    // (n * 1000000) AS k_$tag""".stripMargin
        s"""WITH t AS (SELECT source, unnest(${DuckSql.toks("text")}) AS tok
        |  FROM documents),
        |c AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n
        |  FROM t GROUP BY 1)
        |SELECT source, n AS n_distinct,
        |  ${plan(ln100, "fp1")},
        |  ${plan(ln1000, "fp01")}
        |FROM c ORDER BY source""".stripMargin
      })
  )
}
