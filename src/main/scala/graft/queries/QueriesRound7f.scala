package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 sixth batch: expected calibration error (the classifier
  * trust readout next to q217's AUC), time-weighted averages over
  * irregular event series (the LOCF integral), variance-proportional
  * stratified allocation (sampling DESIGN feeding the q181 planner),
  * and the 2-D Pareto frontier (non-dominated curation picks) whose
  * oracle is a genuinely independent quadratic NOT-EXISTS — not a
  * computation mirror.
  */
object QueriesRound7f {

  val defs: Seq[QueryDef] = Seq(

    // ---- q308: expected calibration error (reliability bins) -----------
    // The calibration readout for any scored filter: scores in
    // permille (md5-derived here, so the oracle replays them), labels
    // drawn such that P(label=1 | score) = score/1000 — a perfectly
    // calibrated scorer, making the EXPECTED gap small; a binning or
    // rate bug blows it up. Ten reliability bins; per bin the mean
    // confidence and the positive rate in ppm (separate floor
    // divisions — pinned), the |gap|, and the ECE total as a window
    // over the 10-BIN frame only. One corpus scan, one 10-group
    // aggregation.
    QueryDef("q308_calibration_ece",
      (s, d) => {
        val score = Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit("#score"))) % 1000
        val label = (Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit("#label"))) % 1000
          < col("__score")).cast("long")
        val bins = documents(s, d)
          .select(col("doc_id"), score.as("__score"))
          .select(col("doc_id"), col("__score"), label.as("__y"))
          .groupBy((col("__score") / 100).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"),
            sum("__score").as("__ss"), sum("__y").as("n_pos"))
          .select(col("bin"), col("n"), col("n_pos"),
            expr("(__ss * 1000) div n").as("conf_ppm"),
            expr("(n_pos * 1000000) div n").as("acc_ppm"))
          .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
        bins.withColumn("ece_ppm",
            expr("sum(gap_ppm * n) OVER () div sum(n) OVER ()"))
          .orderBy("bin")
      },
      Some {
        val sc = DuckSql.hashLong("CAST(doc_id AS VARCHAR) || '#score'")
        val lb = DuckSql.hashLong("CAST(doc_id AS VARCHAR) || '#label'")
        s"""WITH sl AS (SELECT doc_id, $sc % 1000 AS score,
        |    CASE WHEN $lb % 1000 < $sc % 1000 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (SELECT score // 100 AS bin, count(*) AS n,
        |    sum(y) AS n_pos,
        |    (sum(score) * 1000) // count(*) AS conf_ppm,
        |    (sum(y) * 1000000) // count(*) AS acc_ppm
        |  FROM sl GROUP BY 1)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        |  CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(conf_ppm AS BIGINT) AS conf_ppm,
        |  CAST(acc_ppm AS BIGINT) AS acc_ppm,
        |  CAST(abs(conf_ppm - acc_ppm) AS BIGINT) AS gap_ppm,
        |  CAST(sum(abs(conf_ppm - acc_ppm) * n) OVER ()
        |    // sum(n) OVER () AS BIGINT) AS ece_ppm
        |FROM b ORDER BY bin""".stripMargin
      }),

    // ---- q309: time-weighted average (LOCF integral) -------------------
    // TWAP over irregular per-user event series: each value holds
    // until the next event (last observation carried forward), so the
    // average weights each value by its holding time — the metric that
    // plain mean gets wrong on irregular sampling. Gaps in integer
    // MILLISECONDS (floored once, the same gaps in numerator and
    // denominator — pinned; µs gaps would push Σv·Δt past 2⁶³ at month
    // spans), values in exact cents, one lead() window per user.
    // Single-event users report n=1 with null twap.
    QueryDef("q309_time_weighted_avg",
      (s, d) => {
        val wu = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            (col("value").cast("decimal(18,2)") * 100).cast("long")
              .as("v_cents"))
          .withColumn("__next", lead(col("ts_us"), 1).over(wu))
          .withColumn("__dt_ms",
            expr("(__next - ts_us) div 1000"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("__dt_ms").as("span_ms"),
            sum(col("v_cents") * col("__dt_ms")).as("__num"))
          .select(col("user_id"), col("n_events"),
            coalesce(col("span_ms"), lit(0L)).as("span_ms"),
            when(coalesce(col("span_ms"), lit(0L)) > 0,
              expr("(__num * 1000) div span_ms")).as("twap_millicents"))
          .orderBy("user_id")
      },
      Some("""WITH o AS (SELECT user_id, event_id,
        |    epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events),
        |g AS (SELECT user_id, v_cents,
        |    (lead(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) - ts_us) // 1000 AS dt_ms
        |  FROM o),
        |a AS (SELECT user_id, count(*) AS n_events,
        |    sum(dt_ms) AS span_ms, sum(v_cents * dt_ms) AS num
        |  FROM g GROUP BY 1)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(coalesce(span_ms, 0) AS BIGINT) AS span_ms,
        |  CASE WHEN coalesce(span_ms, 0) > 0
        |    THEN CAST((num * 1000) // span_ms AS BIGINT) END
        |    AS twap_millicents
        |FROM a ORDER BY user_id""".stripMargin)),

    // ---- q310: variance-proportional stratified allocation -------------
    // Sampling DESIGN ahead of the q181 planner: strata that vary more
    // internally get more of the sample budget. Weight_h =
    // (n_h·Σx² − (Σx)²) div n_h — n_h·Var_h in exact integers (the
    // sqrt-free surrogate of Neyman's n_h·σ_h: same structure, heavier
    // tilt to high-variance strata; σ needs a square root the engine
    // only does at the float edge). Weights feed the SAME
    // largest-remainder apportionment as q181, so Σ quota == 10000 by
    // construction. One aggregation over the corpus, windows over the
    // O(strata) frame only.
    QueryDef("q310_variance_allocation",
      (s, d) => {
        val w = documents(s, d)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_h"),
            sum(col("n_chars")).as("__s1"),
            sum(col("n_chars") * col("n_chars")).as("__s2"))
          .select(col("lang"), col("source"), col("n_h"),
            expr("(n_h * __s2 - __s1 * __s1) div n_h").as("weight"))
        Sampling.allocateBudget(w, Seq("lang", "source"), "weight", 10000L)
          .join(w.select(col("lang"), col("source"), col("n_h")),
            Seq("lang", "source"))
          .select(col("lang"), col("source"), col("n_h"), col("weight"),
            col("quota"))
          .orderBy("lang", "source")
      },
      Some("""WITH w AS (SELECT lang, source, count(*) AS n_h,
        |    (count(*) * sum(n_chars * n_chars)
        |      - sum(n_chars) * sum(n_chars)) // count(*) AS weight
        |  FROM documents GROUP BY 1, 2),
        |q AS (SELECT lang, source, n_h, weight,
        |    (10000 * weight) // (SELECT sum(weight) FROM w) AS fq,
        |    (10000 * weight) % (SELECT sum(weight) FROM w) AS rem FROM w),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source)
        |    AS rk FROM q)
        |SELECT lang, source, CAST(n_h AS BIGINT) AS n_h,
        |  CAST(weight AS BIGINT) AS weight,
        |  CAST(fq + CASE WHEN rk <= (SELECT 10000 - sum(fq) FROM q)
        |    THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM r ORDER BY lang, source""".stripMargin)),

    // ---- q311: 2-D Pareto frontier (distinct-x collapse algorithm) -----
    // "Keep documents no other document beats on BOTH length and
    // vocabulary": doc u dominates v iff s1_u ≥ s1_v, s2_u ≥ s2_v,
    // strict somewhere. DELIBERATELY a second, structurally different
    // skyline next to q203's grid-pruned Relational.paretoFrontier:
    // collapse to per-s1 groups (max s2), one prefix-max window over
    // the DISTINCT-s1 frame (domain-bounded — distinct lengths, not
    // docs), then a doc survives iff its s2 equals its group max AND
    // strictly exceeds every greater-s1 group's max. Three paths now
    // pin the operator against each other: this window algebra, the
    // grid-pruned helper (Round7fSpec cross-pin), and the quadratic
    // NOT-EXISTS oracle below — none of them a mirror of another.
    QueryDef("q311_pareto_frontier",
      (s, d) => {
        val scored = documents(s, d).select(col("doc_id"),
          col("n_chars").as("s1"),
          size(array_distinct(Text.tokens(col("text")))).cast("long")
            .as("s2"))
        val grp = scored.groupBy("s1").agg(max("s2").as("__gmax"))
        val wPrev = Window.orderBy(col("s1").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val grpRanked = grp.withColumn("__pmax",
          coalesce(max(col("__gmax")).over(wPrev), lit(Long.MinValue)))
        scored.join(broadcast(grpRanked), Seq("s1"))
          .where(col("s2") === col("__gmax") && col("s2") > col("__pmax"))
          .select(col("doc_id"), col("s1"), col("s2"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sc AS (SELECT doc_id, n_chars AS s1,
        |    len(list_distinct(${DuckSql.toks("text")})) AS s2
        |  FROM documents)
        |SELECT doc_id, CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2
        |FROM sc a
        |WHERE NOT EXISTS (SELECT 1 FROM sc b
        |  WHERE b.s1 >= a.s1 AND b.s2 >= a.s2
        |    AND (b.s1 > a.s1 OR b.s2 > a.s2))
        |ORDER BY doc_id""".stripMargin)))
}
