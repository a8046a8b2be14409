package graft.queries

import graft.Tables._
import graft.ops.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 sixteenth batch: robust outlier gating (MAD) and
  * trend forecasting (Holt's linear method).
  */
object QueriesRound9p {

  val defs: Seq[QueryDef] = Seq(

    // ---- q519: MAD robust outlier gate ---------------------------------------
    // The robust-statistics completion of the winsorize/trimmed-mean
    // family (q357/q490): per-event-type median and median-absolute-
    // deviation as EXACT order statistics, outliers flagged by the
    // classic dev > 3·1.4826·MAD rule kept integer (dev·10⁴ >
    // 44478·MAD). Mean/stddev gates break under the very tail mass
    // they're meant to catch; the MAD gate's breakdown point is 50%.
    // Both medians read from composite-key twoLevelCumSum histogram
    // cums (idx·2³³ + value, the q343/q362 trick) — no corpus-sized
    // window, no per-group single-task scan, at any SF.
    QueryDef("q519_mad_outliers",
      (s, d) => {
        def groupedMedian(vals: org.apache.spark.sql.DataFrame,
                          outName: String) = {
          val hist = vals.groupBy("idx", "v").agg(count(lit(1)).as("__c"))
            .withColumn("__ck", expr("idx * 8589934592L + v"))
          val cum = Relational.twoLevelCumSum(hist, "__ck", "__c", 1048576L)
          val gt = hist.groupBy("idx").agg(sum("__c").as("__n"))
          val wOff = Window.orderBy("idx")
            .rowsBetween(Window.unboundedPreceding, -1)
          val off = broadcast(gt.select(col("idx"), col("__n"),
            coalesce(sum("__n").over(wOff), lit(0L)).as("__off")))
          cum.join(off, Seq("idx"))
            .groupBy("idx", "__n")
            .agg(min(when((col("cum") - col("__off")) * 2 >= col("__n"),
              col("v"))).as(outName))
        }
        val cents = events(s, d).select(
          expr("CAST(ascii(substring(event_type, 1, 1)) AS BIGINT)")
            .as("idx"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
        val dim = events(s, d).select(
          expr("CAST(ascii(substring(event_type, 1, 1)) AS BIGINT)")
            .as("idx"), col("event_type")).distinct()
        val med = groupedMedian(cents, "med")
          .select(col("idx"), col("__n").as("n"), col("med"))
        val dev = cents.join(broadcast(med), Seq("idx"))
          .select(col("idx"), abs(col("v") - col("med")).as("v"))
        val mad = groupedMedian(dev, "mad").select("idx", "mad")
        val out = dev.join(broadcast(mad), Seq("idx"))
          .groupBy("idx")
          .agg(sum(when(col("v") * 10000 > col("mad") * 44478, 1L)
            .otherwise(0L)).as("n_outliers"))
        med.join(broadcast(mad), Seq("idx")).join(broadcast(out), Seq("idx"))
          .join(broadcast(dim), Seq("idx"))
          .select(col("event_type"), col("n"), col("med").as("med_cents"),
            col("mad").as("mad_cents"), col("n_outliers"),
            expr("n_outliers * 1000000 div n").as("outlier_ppm"))
          .orderBy("event_type")
      },
      Some("""WITH c AS (SELECT event_type AS et,
        |    CAST(ascii(substring(event_type, 1, 1)) AS BIGINT) AS idx,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h1 AS (SELECT idx, v, count(*) AS c FROM c GROUP BY 1, 2),
        |cw1 AS (SELECT idx, v, sum(c) OVER (PARTITION BY idx ORDER BY v)
        |    AS cw FROM h1),
        |n1 AS (SELECT idx, count(*) AS n FROM c GROUP BY 1),
        |med AS (SELECT cw1.idx, min(n1.n) AS n,
        |    min(CASE WHEN cw1.cw * 2 >= n1.n THEN cw1.v END) AS med
        |  FROM cw1 JOIN n1 ON n1.idx = cw1.idx GROUP BY 1),
        |dev AS (SELECT c.idx, abs(c.v - med.med) AS v
        |  FROM c JOIN med ON med.idx = c.idx),
        |h2 AS (SELECT idx, v, count(*) AS c FROM dev GROUP BY 1, 2),
        |cw2 AS (SELECT idx, v, sum(c) OVER (PARTITION BY idx ORDER BY v)
        |    AS cw FROM h2),
        |mad AS (SELECT cw2.idx,
        |    min(CASE WHEN cw2.cw * 2 >= n1.n THEN cw2.v END) AS mad
        |  FROM cw2 JOIN n1 ON n1.idx = cw2.idx GROUP BY 1),
        |o AS (SELECT dev.idx,
        |    sum(CASE WHEN dev.v * 10000 > mad.mad * 44478 THEN 1
        |      ELSE 0 END) AS n_outliers
        |  FROM dev JOIN mad ON mad.idx = dev.idx GROUP BY 1),
        |dim AS (SELECT DISTINCT idx, et FROM c)
        |SELECT dim.et AS event_type, CAST(med.n AS BIGINT) AS n,
        |  med.med AS med_cents,
        |  mad.mad AS mad_cents, CAST(o.n_outliers AS BIGINT) AS n_outliers,
        |  CAST(o.n_outliers * 1000000 // med.n AS BIGINT) AS outlier_ppm
        |FROM med JOIN mad ON mad.idx = med.idx
        |  JOIN o ON o.idx = med.idx JOIN dim ON dim.idx = med.idx
        |ORDER BY dim.et""".stripMargin)),

    // ---- q520: Holt linear-trend forecast -------------------------------------
    // Capacity planning on user activity: Holt's double exponential
    // smoothing (level + trend) over each user's 30-day count series,
    // 7-day-ahead forecast, the top-growth readout. α=0.5, β=0.25 —
    // dyadic constants, and BOTH engines run the identical IEEE-754
    // fold in the identical order (Spark: column-expression
    // `aggregate` over the day-sorted grid; oracle: recursive CTE),
    // so the doubles hash-match bit-for-bit — the q129-EWMA
    // discipline extended to two-state recurrences. Zero-activity
    // days matter to a forecast, so the fold runs over the dense
    // 30-day grid, not the sparse event rows.
    QueryDef("q520_holt_forecast",
      (s, d) => {
        val ev = events(s, d)
          .select(col("user_id"), dayofmonth(col("ts")).as("day"))
        val users = ev.select("user_id").distinct()
        val days = users.sparkSession.range(1, 31)
          .select(col("id").cast("int").as("day"))
        val cnt = ev.groupBy("user_id", "day").agg(count(lit(1)).as("c"))
        val series = users.crossJoin(days)
          .join(cnt, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("c"), lit(0L)).as("c"))
          .groupBy("user_id")
          .agg(expr("transform(array_sort(collect_list(struct(day, c)))," +
            " e -> CAST(e.c AS DOUBLE))").as("ys"))
        val fin = series.withColumn("st", expr(
          """aggregate(ys,
            |  named_struct('t', 0, 'l', CAST(0.0 AS DOUBLE),
            |    'b', CAST(0.0 AS DOUBLE)),
            |  (acc, y) -> CASE WHEN acc.t = 0
            |    THEN named_struct('t', 1, 'l', y, 'b', CAST(0.0 AS DOUBLE))
            |    ELSE named_struct('t', acc.t + 1,
            |      'l', CAST(0.5 AS DOUBLE) * y
            |        + CAST(0.5 AS DOUBLE) * (acc.l + acc.b),
            |      'b', CAST(0.25 AS DOUBLE) * (CAST(0.5 AS DOUBLE) * y
            |          + CAST(0.5 AS DOUBLE) * (acc.l + acc.b) - acc.l)
            |        + CAST(0.75 AS DOUBLE) * acc.b) END)""".stripMargin))
        fin.select(col("user_id"),
          col("st.l").as("level"), col("st.b").as("trend"),
          (col("st.l") + lit(7.0) * col("st.b")).as("forecast_7d"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
        |cnt AS (SELECT user_id, day(ts) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT u.user_id, g.day,
        |    CAST(coalesce(cnt.c, 0) AS DOUBLE) AS y
        |  FROM u CROSS JOIN (SELECT unnest(generate_series(1, 30)) AS day) g
        |  LEFT JOIN cnt ON cnt.user_id = u.user_id AND cnt.day = g.day),
        |w AS (
        |  SELECT user_id, 1 AS t, y AS l, CAST(0.0 AS DOUBLE) AS b
        |  FROM grid WHERE day = 1
        |  UNION ALL
        |  SELECT w.user_id, w.t + 1,
        |    CAST(0.5 AS DOUBLE) * g.y + CAST(0.5 AS DOUBLE) * (w.l + w.b),
        |    CAST(0.25 AS DOUBLE) * (CAST(0.5 AS DOUBLE) * g.y
        |        + CAST(0.5 AS DOUBLE) * (w.l + w.b) - w.l)
        |      + CAST(0.75 AS DOUBLE) * w.b
        |  FROM w JOIN grid g ON g.user_id = w.user_id AND g.day = w.t + 1
        |  WHERE w.t < 30)
        |SELECT user_id, l AS level, b AS trend,
        |  l + CAST(7.0 AS DOUBLE) * b AS forecast_7d
        |FROM w WHERE t = 30 ORDER BY user_id""".stripMargin))
  )
}
