package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 eighteenth batch: exact time-series diagnostics (integer
  * autocorrelation and CUSUM change-point) and the re-crawl churn
  * readout.
  */
object QueriesRound6r {

  /** Hourly event-count series per type — the shared spine of
    * q281/q282: one map-side-combining aggregation to the O(types ×
    * hours) frame; every window below runs over THAT frame, never
    * over event rows. */
  private def hourlySeries(s: org.apache.spark.sql.SparkSession,
                           d: String) =
    events(s, d)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 3600").as("hb"))
      .groupBy("event_type", "hb").agg(count(lit(1)).as("c"))

  // floor() explicitly: epoch() returns DOUBLE, and on doubles
  // DuckDB's `//` is plain division while CAST to BIGINT ROUNDS —
  // together they'd shift boundary rows into the next hour
  private val hourlySql =
    """ser AS (SELECT event_type,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb, count(*) AS c
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- q281: exact integer autocorrelation (lags 1-3) --------------
    // Seasonality/burstiness diagnostic on the hourly count series,
    // with the mean-centering done WITHOUT fractions: y_i = n·c_i − S
    // (= n·(c_i − mean), integer), so ACF_k = Σ y_i·y_{i+k} / Σ y_i²
    // is a ratio of exact integers reported in ppm — engine-identical,
    // no float accumulation. Lags come from lead() windows over the
    // per-type series frame (hours, not events); a lag-0 row carries
    // the variance so the readout is self-contained.
    QueryDef("q281_autocorrelation",
      (s, d) => {
        val ser = hourlySeries(s, d)
        val scal = ser.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("tot"))
        val y = ser.join(broadcast(scal), "event_type")
          .select(col("event_type"), col("hb"), col("n"),
            (col("n") * col("c") - col("tot")).as("y"))
        val w = Window.partitionBy("event_type").orderBy("hb")
        val lagged = y.select(col("event_type"), col("n"), col("y"),
          lead(col("y"), 1).over(w).as("y1"),
          lead(col("y"), 2).over(w).as("y2"),
          lead(col("y"), 3).over(w).as("y3"))
        lagged.groupBy("event_type")
          .agg(first("n").as("n_hours"),
            sum(col("y") * col("y")).as("den"),
            sum(col("y") * col("y1")).as("num1"),
            sum(col("y") * col("y2")).as("num2"),
            sum(col("y") * col("y3")).as("num3"))
          .select(col("event_type"), col("n_hours"),
            expr("(num1 * 1000000) div den").as("acf1_ppm"),
            expr("(num2 * 1000000) div den").as("acf2_ppm"),
            expr("(num3 * 1000000) div den").as("acf3_ppm"))
          .orderBy("event_type")
      },
      Some(s"""WITH $hourlySql,
        |sc AS (SELECT event_type, count(*) AS n, sum(c) AS tot
        |  FROM ser GROUP BY 1),
        |y AS (SELECT ser.event_type, hb, sc.n,
        |    sc.n * ser.c - sc.tot AS y
        |  FROM ser JOIN sc USING (event_type)),
        |lg AS (SELECT event_type, n, y,
        |    lead(y, 1) OVER (PARTITION BY event_type ORDER BY hb) AS y1,
        |    lead(y, 2) OVER (PARTITION BY event_type ORDER BY hb) AS y2,
        |    lead(y, 3) OVER (PARTITION BY event_type ORDER BY hb) AS y3
        |  FROM y)
        |SELECT event_type, CAST(min(n) AS BIGINT) AS n_hours,
        |  CAST((sum(y * y1) * 1000000) // sum(y * y) AS BIGINT) AS acf1_ppm,
        |  CAST((sum(y * y2) * 1000000) // sum(y * y) AS BIGINT) AS acf2_ppm,
        |  CAST((sum(y * y3) * 1000000) // sum(y * y) AS BIGINT) AS acf3_ppm
        |FROM lg GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q282: CUSUM change-point detection --------------------------
    // "When did the rate shift" on the hourly series, exactly: the
    // classic CUSUM statistic S_k = Σ_{i≤k}(c_i − mean) rescaled by n
    // to stay integer — S'_k = n·Σ_{i≤k} c_i − k·S — and the change
    // point is the hour maximizing |S'_k| (earliest hour on ties).
    // One cumulative window per type over the hours frame, one
    // struct-max argmax; everything integer, both engines agree to
    // the bit.
    QueryDef("q282_change_point",
      (s, d) => {
        val ser = hourlySeries(s, d)
        val scal = ser.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("tot"))
        val w = Window.partitionBy("event_type").orderBy("hb")
        val cum = ser.join(broadcast(scal), "event_type")
          .withColumn("k", row_number().over(w).cast("long"))
          .withColumn("s_k",
            col("n") * sum("c").over(w) - col("k") * col("tot"))
        cum.groupBy("event_type")
          .agg(first("n").as("n_hours"),
            max(struct(abs(col("s_k")).as("a"), (-col("hb")).as("nhb")))
              .as("__m"))
          .select(col("event_type"), col("n_hours"),
            col("__m.a").as("max_abs_cusum"),
            (-col("__m.nhb")).as("change_hour_bucket"))
          .orderBy("event_type")
      },
      Some(s"""WITH $hourlySql,
        |sc AS (SELECT event_type, count(*) AS n, sum(c) AS tot
        |  FROM ser GROUP BY 1),
        |cum AS (SELECT ser.event_type, hb, sc.n,
        |    sc.n * sum(c) OVER (PARTITION BY ser.event_type ORDER BY hb)
        |      - (row_number() OVER (PARTITION BY ser.event_type ORDER BY hb))
        |        * sc.tot AS s_k
        |  FROM ser JOIN sc USING (event_type)),
        |rk AS (SELECT event_type, n, hb, abs(s_k) AS a,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(s_k) DESC, hb ASC) AS r
        |  FROM cum)
        |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
        |  CAST(a AS BIGINT) AS max_abs_cusum,
        |  CAST(hb AS BIGINT) AS change_hour_bucket
        |FROM rk WHERE r = 1 ORDER BY event_type""".stripMargin)),

    // ---- q283: re-crawl churn (edit-distance drift) ------------------
    // "How much did this page change since the last crawl" — the
    // signal that schedules re-crawls and separates living documents
    // from static ones. The previous crawl is synthesized
    // deterministically (every 3rd doc gets its digits struck, every
    // 5th a prefix clip — both engines build identical twins), and
    // churn = levenshtein / max(len) in integer ppm. Edit distance
    // runs per ROW (doc vs its own twin) — linear work, no pairing
    // join anywhere; the expensive general form (any-to-any fuzzy
    // match) stays q109's blocked domain.
    QueryDef("q283_crawl_churn",
      (s, d) => {
        val prev = when(col("doc_id") % 3 === 0,
            regexp_replace(col("text"), "[0-9]", ""))
          .when(col("doc_id") % 5 === 0,
            substring(col("text"), 1, 80))
          .otherwise(col("text"))
        documents(s, d).where(col("doc_id") < 300)
          .select(col("doc_id"), col("text"), prev.as("prev"))
          .select(col("doc_id"),
            levenshtein(col("prev"), col("text")).cast("long").as("edits"),
            greatest(length(col("text")), length(col("prev")))
              .cast("long").as("span"))
          .select(col("doc_id"), col("edits"), col("span"),
            expr("(edits * 1000000) div span").as("churn_ppm"),
            (col("edits") === 0).as("unchanged"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id, text,
        |    CASE WHEN doc_id % 3 = 0 THEN regexp_replace(text, '[0-9]', '', 'g')
        |      WHEN doc_id % 5 = 0 THEN substr(text, 1, 80)
        |      ELSE text END AS prev
        |  FROM documents WHERE doc_id < 300)
        |SELECT doc_id,
        |  CAST(levenshtein(prev, text) AS BIGINT) AS edits,
        |  CAST(greatest(length(text), length(prev)) AS BIGINT) AS span,
        |  CAST((levenshtein(prev, text) * 1000000)
        |    // greatest(length(text), length(prev)) AS BIGINT) AS churn_ppm,
        |  levenshtein(prev, text) = 0 AS unchanged
        |FROM p ORDER BY doc_id""".stripMargin))
  )
}
