package graft.queries

import graft.Tables._
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Round-7 thirtieth batch: the sketch-mergeability law made a query,
  * the watermark-lateness completeness curve, and the dictionary-
  * encoding storage planner.
  */
object QueriesRound7ad {

  val defs: Seq[QueryDef] = Seq(

    // ---- q398: histogram-sketch merge law + measured quantile error -----
    // The algebra that makes sketches work on clusters, verified IN
    // the query (the q396 self-proving structure): a 64-bin equi-width
    // histogram sketch of n_chars built separately on the even-id and
    // odd-id halves, merged bin-wise, compared against the
    // direct-build sketch — `merge_exact` must be true (histogram
    // merge is lossless, unlike the quantile readout), and the P50/P90
    // ESTIMATES from the merged sketch sit next to the exact order
    // statistics with their error in ppm. Mergeability is why one
    // pass + one O(bins) shuffle replaces a global sort at 100 TB.
    QueryDef("q398_sketch_merge_law",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          col("n_chars"))
        val hi = broadcast(docs.agg(max("n_chars").as("mx"),
          count(lit(1)).as("n")))
        val binned = docs.crossJoin(hi)
          .select(col("doc_id"), col("n_chars"), col("mx"), col("n"),
            least(expr("(n_chars * 64) div (mx + 1)"), lit(63L)).as("b"))
        def sketch(cond: org.apache.spark.sql.Column) = binned
          .where(cond).groupBy("b").agg(count(lit(1)).as("c"))
        val direct = sketch(lit(true))
        val merged = sketch(col("doc_id") % 2 === 0)
          .withColumnRenamed("c", "ce")
          .join(sketch(col("doc_id") % 2 === 1)
            .withColumnRenamed("c", "co"), Seq("b"), "full_outer")
          .select(col("b"),
            (coalesce(col("ce"), lit(0L)) + coalesce(col("co"), lit(0L)))
              .as("c"))
        val matches = broadcast(merged.withColumnRenamed("c", "cm")
          .join(direct.withColumnRenamed("c", "cd"), Seq("b"),
            "full_outer")
          .agg(sum(when(coalesce(col("cm"), lit(-1L)) ===
            coalesce(col("cd"), lit(-2L)), 0L).otherwise(1L))
            .as("n_mismatch")))
        // quantile estimate from the merged sketch: first bin whose
        // running count reaches k, estimated value = bin upper bound
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("b").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val cum = merged.crossJoin(hi)
          .withColumn("run", sum("c").over(wCum))
        def est(pct: Int, name: String) = broadcast(cum
          .where(col("run") >= expr(s"(n * $pct + 99) div 100"))
          .crossJoin(hi.select(col("mx").as("__m")))
          .agg(min(expr("((b + 1) * (__m + 1)) div 64")).as(name)))
        // exact order statistic over the value histogram (q182 pass)
        val vh = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
        val wV = org.apache.spark.sql.expressions.Window
          .orderBy("n_chars").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val vcum = vh.crossJoin(hi).withColumn("run", sum("c").over(wV))
        def exact(pct: Int, name: String) = broadcast(vcum
          .where(col("run") >= expr(s"(n * $pct + 99) div 100"))
          .agg(min("n_chars").as(name)))
        hi.crossJoin(matches)
          .crossJoin(est(50, "p50_est")).crossJoin(exact(50, "p50_exact"))
          .crossJoin(est(90, "p90_est")).crossJoin(exact(90, "p90_exact"))
          .select(col("n"), lit(64L).as("n_bins"),
            (col("n_mismatch") === 0L).as("merge_exact"),
            col("p50_est"), col("p50_exact"),
            expr("(abs(p50_est - p50_exact) * 1000000) div p50_exact")
              .as("p50_err_ppm"),
            col("p90_est"), col("p90_exact"),
            expr("(abs(p90_est - p90_exact) * 1000000) div p90_exact")
              .as("p90_err_ppm"))
      },
      Some("""WITH hi AS (SELECT max(n_chars) AS mx, count(*) AS n
        |  FROM documents),
        |bn AS (SELECT doc_id, n_chars,
        |    least((n_chars * 64) // (mx + 1), 63) AS b
        |  FROM documents, hi),
        |de AS (SELECT b, count(*) AS cd FROM bn GROUP BY 1),
        |se AS (SELECT b, count(*) AS ce FROM bn
        |  WHERE doc_id % 2 = 0 GROUP BY 1),
        |so AS (SELECT b, count(*) AS co FROM bn
        |  WHERE doc_id % 2 = 1 GROUP BY 1),
        |mg AS (SELECT coalesce(se.b, so.b) AS b,
        |    coalesce(ce, 0) + coalesce(co, 0) AS cm
        |  FROM se FULL OUTER JOIN so ON se.b = so.b),
        |mm AS (SELECT sum(CASE WHEN coalesce(cm, -1)
        |      = coalesce(cd, -2) THEN 0 ELSE 1 END) AS n_mismatch
        |  FROM mg FULL OUTER JOIN de ON mg.b = de.b),
        |cum AS (SELECT b, sum(cm) OVER (ORDER BY b
        |    ROWS UNBOUNDED PRECEDING) AS run FROM mg),
        |e50 AS (SELECT min(((b + 1) * (mx + 1)) // 64) AS p50_est
        |  FROM cum, hi WHERE run >= (n * 50 + 99) // 100),
        |e90 AS (SELECT min(((b + 1) * (mx + 1)) // 64) AS p90_est
        |  FROM cum, hi WHERE run >= (n * 90 + 99) // 100),
        |vh AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY 1),
        |vc AS (SELECT n_chars, sum(c) OVER (ORDER BY n_chars
        |    ROWS UNBOUNDED PRECEDING) AS run FROM vh),
        |x50 AS (SELECT min(n_chars) AS p50_exact FROM vc, hi
        |  WHERE run >= (n * 50 + 99) // 100),
        |x90 AS (SELECT min(n_chars) AS p90_exact FROM vc, hi
        |  WHERE run >= (n * 90 + 99) // 100)
        |SELECT CAST(n AS BIGINT) AS n, CAST(64 AS BIGINT) AS n_bins,
        |  n_mismatch = 0 AS merge_exact,
        |  CAST(p50_est AS BIGINT) AS p50_est,
        |  CAST(p50_exact AS BIGINT) AS p50_exact,
        |  CAST((abs(p50_est - p50_exact) * 1000000) // p50_exact
        |    AS BIGINT) AS p50_err_ppm,
        |  CAST(p90_est AS BIGINT) AS p90_est,
        |  CAST(p90_exact AS BIGINT) AS p90_exact,
        |  CAST((abs(p90_est - p90_exact) * 1000000) // p90_exact
        |    AS BIGINT) AS p90_err_ppm
        |FROM hi, mm, e50, e90, x50, x90""".stripMargin)),

    // ---- q399: watermark-lateness completeness curve --------------------
    // The number q364's skew audit exists to set: for each candidate
    // allowed-lateness L, how many events would a watermark drop?
    // Arrival time = the recorded ts; event time = the q364 planted
    // early-skewed clock (every 7th event skewed early by its 32-bit
    // md5 value in us — at most ~72 min; the % 2e11 cap never binds,
    // both engines identical); lateness = arrival − event time. One scan,
    // conditional sums per L ∈ {0, 1h, 6h, 24h, 48h} — the curve that
    // trades state-store size against completeness, read straight off
    // the data instead of guessed.
    QueryDef("q399_lateness_curve",
      (s, d) => {
        val lats = events(s, d)
          .select(when(col("event_id") % 7 === 0,
            Sampling.hashLong(concat(col("event_id").cast("string"),
              lit("#skew"))) % 200000000000L).otherwise(0L).as("lat"))
        val grid = Seq(0L, 3600L, 21600L, 86400L, 172800L)
        lats
          .crossJoin(broadcast(
            lats.sparkSession.createDataFrame(
              grid.map(Tuple1.apply)).toDF("allowed_sec")))
          .groupBy("allowed_sec")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("lat") > col("allowed_sec") * 1000000L, 1L)
              .otherwise(0L)).as("n_dropped"))
          .select(col("allowed_sec"), col("n_events"), col("n_dropped"),
            expr("(n_dropped * 1000000) div n_events").as("dropped_ppm"))
          .orderBy("allowed_sec")
      },
      Some {
        val h = DuckSql.hashLong("CAST(event_id AS VARCHAR) || '#skew'")
        s"""WITH lat AS (SELECT CASE WHEN event_id % 7 = 0
        |    THEN ($h) % 200000000000 ELSE 0 END AS lat FROM events),
        |g AS (SELECT CAST(unnest([0, 3600, 21600, 86400, 172800])
        |  AS BIGINT) AS allowed_sec)
        |SELECT CAST(allowed_sec AS BIGINT) AS allowed_sec,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN lat > allowed_sec * 1000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST((sum(CASE WHEN lat > allowed_sec * 1000000
        |    THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT)
        |    AS dropped_ppm
        |FROM lat, g GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q400: dictionary-encoding storage planner ----------------------
    // The layout decision q395's stats exist to drive: for each
    // documents column, projected bytes under PLAIN (Σ value lengths;
    // 8 per BIGINT) vs DICTIONARY (distinct values once + n indices
    // of ceil(log2 ndv) bits, byte-rounded per value — the parquet
    // first-order model) — all exact integer arithmetic from one
    // stats pass per column, winner flagged. Low-cardinality lang /
    // source dictionary-win and high-cardinality text plain-win fall
    // out of the model, not of opinion.
    QueryDef("q400_encoding_planner",
      (s, d) => {
        val doc = documents(s, d)
        def plan(name: String, len: org.apache.spark.sql.Column,
                 c: String) =
          doc.agg(count(lit(1)).as("n"),
            countDistinct(col(c)).as("ndv"),
            sum(len).as("bytes_plain"),
            sum(when(col(c).isNotNull, len).otherwise(lit(0L)))
              .as("__tl"))
          .crossJoin(broadcast(doc.select(col(c)).distinct()
            .agg(coalesce(sum(len), lit(0L)).as("__dl"))))
          .select(lit(name).as("column"), col("n"), col("ndv"),
            col("bytes_plain"),
            (col("__dl") + col("n") *
              expr("(length(bin(greatest(ndv - 1, 1))) + 7) div 8"))
              .as("bytes_dict"))
          .withColumn("dict_wins", col("bytes_dict") < col("bytes_plain"))
        plan("doc_id", lit(8L), "doc_id")
          .unionByName(plan("lang", length(col("lang")).cast("long"),
            "lang"))
          .unionByName(plan("source", length(col("source")).cast("long"),
            "source"))
          .unionByName(plan("text", length(col("text")).cast("long"),
            "text"))
          .orderBy("column")
      },
      Some {
        def plan(name: String, len: String, c: String) =
          s"""SELECT '$name' AS "column",
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             |  CAST(sum($len) AS BIGINT) AS bytes_plain,
             |  CAST((SELECT coalesce(sum($len), 0) FROM
             |      (SELECT DISTINCT $c FROM documents))
             |    + count(*) * ((length(format('{:b}',
             |      greatest(count(DISTINCT $c) - 1, 1))) + 7) // 8)
             |    AS BIGINT) AS bytes_dict,
             |  (SELECT coalesce(sum($len), 0) FROM
             |      (SELECT DISTINCT $c FROM documents))
             |    + count(*) * ((length(format('{:b}',
             |      greatest(count(DISTINCT $c) - 1, 1))) + 7) // 8)
             |    < sum($len) AS dict_wins
             |FROM documents""".stripMargin
        s"""SELECT * FROM (
        |${plan("doc_id", "8", "doc_id")}
        |UNION ALL ${plan("lang", "length(lang)", "lang")}
        |UNION ALL ${plan("source", "length(source)", "source")}
        |UNION ALL ${plan("text", "length(text)", "text")})
        |ORDER BY "column" """.stripMargin
      }))
}
