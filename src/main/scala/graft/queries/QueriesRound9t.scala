package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-9 twentieth batch: survival analysis (Kaplan–Meier with
  * right-censoring).
  */
object QueriesRound9t {

  val defs: Seq[QueryDef] = Seq(

    // ---- q526: Kaplan-Meier survival curve -------------------------------------
    // Retention done right: q107-style cohort tables understate
    // survival because users who simply left the observation window
    // count as churned; KM separates FAILURE (first FATAL error —
    // event_id % 23 = 0, rare by construction so a real censored
    // population exists: plain 'error' is so frequent here that every
    // user fails, measured) from CENSORING (last activity day, no
    // fatal seen) and
    // multiplies per-day hazards over the at-risk set only. The
    // corpus reduces to a 30-row (day, n_risk, d, c) life table in
    // one scan + one tiny cum; the survival product is a sequential
    // fold over those 30 rows — floor-micro at every step
    // (s' = s·(n−d) div n, Spark div ≡ DuckDB // on non-negatives),
    // walked identically by a recursive-CTE oracle. Output is the
    // whole life table WITH the curve, so every hazard step is
    // hash-pinned.
    QueryDef("q526_kaplan_meier",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          dayofmonth(col("ts")).as("day"), col("event_type"),
          col("event_id"))
        val perUser = ev.groupBy("user_id").agg(
          min(when(col("event_type") === "error" &&
            col("event_id") % 23 === 0, col("day"))).as("tfail"),
          max(col("day")).as("tlast"))
          .select(col("user_id"),
            coalesce(col("tfail"), col("tlast")).as("t"),
            col("tfail").isNotNull.as("failed"))
        val lifeRaw = perUser.groupBy("t").agg(
          sum(when(col("failed"), 1L).otherwise(0L)).as("d"),
          sum(when(col("failed"), 0L).otherwise(1L)).as("c"))
        // dense 30-day table: days with no exits still appear (S flat)
        val days = lifeRaw.sparkSession.range(1, 31)
          .select(col("id").cast("int").as("t"))
        val life = days.join(lifeRaw, Seq("t"), "left")
          .select(col("t"), coalesce(col("d"), lit(0L)).as("d"),
            coalesce(col("c"), lit(0L)).as("c"))
        val total = perUser.agg(count(lit(1)).as("__total"))
        val withRisk = life
          .withColumn("exits_before", coalesce(sum(expr("d + c")).over(
            org.apache.spark.sql.expressions.Window.orderBy("t")
              .rowsBetween(Long.MinValue, -1)), lit(0L)))
          .crossJoin(broadcast(total))
          .select(col("t"), col("d"), col("c"),
            (col("__total") - col("exits_before")).as("n_risk"))
        // sequential floor-micro survival fold over the 30-row table
        val folded = withRisk
          .select(struct(col("t"), col("n_risk"), col("d"), col("c")).as("r"))
          .agg(array_sort(collect_list("r")).as("rows"))
          .select(expr(
            """aggregate(rows,
              |  named_struct('s', CAST(1000000 AS BIGINT),
              |    'out', CAST(array() AS ARRAY<BIGINT>)),
              |  (acc, e) -> named_struct(
              |    's', CASE WHEN e.n_risk > 0 AND e.d > 0
              |      THEN acc.s * (e.n_risk - e.d) div e.n_risk
              |      ELSE acc.s END,
              |    'out', concat(acc.out, array(CASE WHEN e.n_risk > 0
              |      AND e.d > 0
              |      THEN acc.s * (e.n_risk - e.d) div e.n_risk
              |      ELSE acc.s END))),
              |  acc -> acc.out)""".stripMargin).as("surv"))
          .select(posexplode(col("surv")).as(Seq("i", "s_micro")))
          .select((col("i") + 1).as("t"), col("s_micro"))
        withRisk.join(folded, Seq("t"))
          .select(col("t").cast("long").as("day"), col("n_risk"),
            col("d").as("n_fail"), col("c").as("n_censor"),
            col("s_micro"))
          .orderBy("day")
      },
      Some("""WITH RECURSIVE pu AS (SELECT user_id,
        |    coalesce(min(CASE WHEN event_type = 'error'
        |        AND event_id % 23 = 0 THEN day(ts) END),
        |      max(day(ts))) AS t,
        |    min(CASE WHEN event_type = 'error' AND event_id % 23 = 0
        |      THEN day(ts) END) IS NOT NULL AS failed
        |  FROM events GROUP BY 1),
        |lr AS (SELECT t,
        |    sum(CASE WHEN failed THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN failed THEN 0 ELSE 1 END) AS c
        |  FROM pu GROUP BY 1),
        |life AS (SELECT g.t, CAST(coalesce(lr.d, 0) AS BIGINT) AS d,
        |    CAST(coalesce(lr.c, 0) AS BIGINT) AS c
        |  FROM (SELECT unnest(generate_series(1, 30)) AS t) g
        |  LEFT JOIN lr ON lr.t = g.t),
        |risk AS (SELECT t, d, c,
        |    (SELECT count(*) FROM pu)
        |      - CAST(coalesce(sum(d + c) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS BIGINT) AS n_risk
        |  FROM life),
        |w AS (
        |  SELECT 0 AS t, CAST(1000000 AS BIGINT) AS s
        |  UNION ALL
        |  SELECT r.t,
        |    CASE WHEN r.n_risk > 0 AND r.d > 0
        |      THEN w.s * (r.n_risk - r.d) // r.n_risk ELSE w.s END
        |  FROM w JOIN risk r ON r.t = w.t + 1 WHERE w.t < 30)
        |SELECT CAST(risk.t AS BIGINT) AS day, risk.n_risk,
        |  risk.d AS n_fail, risk.c AS n_censor, w.s AS s_micro
        |FROM risk JOIN w ON w.t = risk.t
        |ORDER BY day""".stripMargin))
  )
}
