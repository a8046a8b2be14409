package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-7 twenty-fifth batch: functional-dependency repair, split
  * conformal prediction, and the disparate-impact fairness audit.
  */
object QueriesRound7y {

  val defs: Seq[QueryDef] = Seq(

    // ---- q383: functional-dependency repair -----------------------------
    // The data-cleaning step past q243's constraint AUDIT: the FD
    // nationkey → regionkey is violated by planted md5 noise (5% of
    // customers get a shifted region — both engines plant
    // identically), and repair assigns each nation the MAJORITY region
    // via the q363 numeric argmax key (count·8 + (7−region): highest
    // count wins, ties to the smallest region — no struct ordering).
    // Violation counting and repair are one O(nations·regions)
    // broadcast join back; output is the per-nation repair ledger.
    QueryDef("q383_fd_repair",
      (s, d) => {
        val base = customer(s, d)
          .select(col("c_custkey").cast("long").as("ck"),
            col("c_nationkey").cast("long").as("nk"))
          .join(broadcast(nation(s, d)
            .select(col("n_nationkey").cast("long").as("nk"),
              col("n_regionkey").cast("long").as("rk"))), Seq("nk"))
          .withColumn("h", Sampling.hashLong(
            concat(col("ck").cast("string"), lit("#fd"))))
          .select(col("nk"),
            when(col("h") % 20 === 0,
              (col("rk") + 1L + col("h") % 4) % 5).otherwise(col("rk"))
              .as("obs"))
        val majority = base.groupBy("nk", "obs")
          .agg(count(lit(1)).as("c"))
          .groupBy("nk")
          .agg(max(col("c") * 8 + (lit(7) - col("obs"))).as("mk"))
          .select(col("nk"), (lit(7) - col("mk") % 8).as("maj"))
        base.join(broadcast(majority), Seq("nk"))
          .groupBy("nk")
          .agg(count(lit(1)).as("n_rows"),
            first("maj").as("majority_region"),
            sum(when(col("obs") =!= col("maj"), 1L).otherwise(0L))
              .as("n_repaired"))
          .select(col("nk").as("nationkey"), col("n_rows"),
            col("majority_region"), col("n_repaired"))
          .orderBy("nationkey")
      },
      Some {
        val h = DuckSql.hashLong("CAST(ck AS VARCHAR) || '#fd'")
        s"""WITH b AS (SELECT CAST(c_custkey AS BIGINT) AS ck,
        |    CAST(c_nationkey AS BIGINT) AS nk,
        |    CAST(n_regionkey AS BIGINT) AS rk
        |  FROM customer JOIN nation ON n_nationkey = c_nationkey),
        |o AS (SELECT nk, CASE WHEN ($h) % 20 = 0
        |    THEN (rk + 1 + ($h) % 4) % 5 ELSE rk END AS obs FROM b),
        |cnt AS (SELECT nk, obs, count(*) AS c FROM o GROUP BY 1, 2),
        |maj AS (SELECT nk, 7 - max(c * 8 + (7 - obs)) % 8 AS maj
        |  FROM cnt GROUP BY 1)
        |SELECT o.nk AS nationkey, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(maj AS BIGINT) AS majority_region,
        |  CAST(sum(CASE WHEN obs != maj THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_repaired
        |FROM o JOIN maj ON maj.nk = o.nk
        |GROUP BY 1, maj ORDER BY 1""".stripMargin
      }),

    // ---- q384: split conformal prediction interval ----------------------
    // Distribution-free uncertainty for the curation stack: a fixed
    // linear predictor (chars ≈ 6·tokens), nonconformity = |error|,
    // q-hat = the ⌈(n+1)·0.9⌉-th smallest calibration score — an
    // EXACT integer order statistic from the q182 value-histogram
    // running-count pass (the cum window runs over the O(distinct
    // scores) frame, never data rows) — then held-out coverage in ppm.
    // Split conformal guarantees ≥ 90% coverage under exchangeability;
    // the md5 split is exchangeable by construction and the spec pins
    // the guarantee with slack.
    QueryDef("q384_conformal_interval",
      (s, d) => {
        val scored = Sampling.hashSplit(
            documents(s, d).select(col("doc_id"), col("n_chars"),
              size(Text.tokens(col("text"))).cast("long").as("nt")),
            "doc_id", 50, 0)
          .select(col("split"),
            abs(col("n_chars") - lit(6L) * col("nt")).as("sc"))
        val cal = scored.where(col("split") === "train")
        val nCal = broadcast(cal.agg(count(lit(1)).as("n_cal")))
        val hist = cal.groupBy("sc").agg(count(lit(1)).as("c"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("sc").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val qhat = broadcast(hist.crossJoin(nCal)
          .withColumn("run", sum("c").over(wCum))
          .where(col("run") >= expr("least((n_cal + 1) * 9 div 10, n_cal)"))
          .agg(min("sc").as("qhat"), first("n_cal").as("n_cal")))
        scored.where(col("split") === "test")
          .crossJoin(qhat)
          .agg(first("n_cal").as("n_cal"), first("qhat").as("qhat"),
            count(lit(1)).as("n_test"),
            sum(when(col("sc") <= col("qhat"), 1L).otherwise(0L))
              .as("n_covered"))
          .select(col("n_cal"), col("qhat"), col("n_test"),
            col("n_covered"),
            expr("(n_covered * 1000000) div n_test").as("coverage_ppm"))
      },
      Some {
        val h = DuckSql.hashLong("doc_id")
        s"""WITH sc AS (SELECT
        |    CASE WHEN ($h) % 100 < 50 THEN 'train' ELSE 'test' END
        |      AS split,
        |    abs(n_chars - 6 * len(${DuckSql.toks("text")})) AS sc
        |  FROM documents),
        |cal AS (SELECT sc FROM sc WHERE split = 'train'),
        |n AS (SELECT count(*) AS n_cal FROM cal),
        |hist AS (SELECT sc, count(*) AS c FROM cal GROUP BY 1),
        |run AS (SELECT sc, sum(c) OVER (ORDER BY sc
        |    ROWS UNBOUNDED PRECEDING) AS run FROM hist),
        |q AS (SELECT min(sc) AS qhat FROM run, n
        |  WHERE run >= least(((n_cal + 1) * 9) // 10, n_cal))
        |SELECT CAST(n.n_cal AS BIGINT) AS n_cal,
        |  CAST(q.qhat AS BIGINT) AS qhat,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN sc.sc <= q.qhat THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  CAST((sum(CASE WHEN sc.sc <= q.qhat THEN 1 ELSE 0 END)
        |    * 1000000) // count(*) AS BIGINT) AS coverage_ppm
        |FROM sc, q, n WHERE sc.split = 'test'
        |GROUP BY n.n_cal, q.qhat""".stripMargin
      }),

    // ---- q385: disparate-impact fairness audit --------------------------
    // The governance lane's selection-bias readout (next to q249
    // k-anonymity and q278 noised release): a curation gate
    // (n_chars ≥ 200) audited per language — selection rate ppm,
    // impact ratio vs the overall rate in exact cross-multiplied
    // integers, and the EEOC 80%-rule flag. One scan plus an
    // O(langs) broadcast of the overall rate; flagged ⟺
    // rate_g·10⁶ < 0.8·rate_all·10⁶ exactly (law spec-pinned).
    QueryDef("q385_fairness_audit",
      (s, d) => {
        val g = documents(s, d)
          .select(col("lang"),
            when(col("n_chars") >= 200, 1L).otherwise(0L).as("sel"))
        val overall = broadcast(g.agg(count(lit(1)).as("n_all"),
          sum("sel").as("s_all")))
        g.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("sel").as("n_selected"))
          .crossJoin(overall)
          .select(col("lang"), col("n"), col("n_selected"),
            expr("(n_selected * 1000000) div n").as("sel_ppm"),
            expr("(n_selected * n_all * 1000000) div (n * s_all)")
              .as("impact_ratio_ppm"),
            // 80% rule on exact integers: r_g < 0.8·r_all ⟺
            // 5·n_selected·n_all < 4·s_all·n
            (col("n_selected") * col("n_all") * 5 <
              col("s_all") * col("n") * 4).as("flagged"))
          .orderBy("lang")
      },
      Some("""WITH g AS (SELECT lang,
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS sel
        |  FROM documents),
        |o AS (SELECT count(*) AS n_all, sum(sel) AS s_all FROM g)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(sel) AS BIGINT) AS n_selected,
        |  CAST((sum(sel) * 1000000) // count(*) AS BIGINT) AS sel_ppm,
        |  CAST((sum(sel) * n_all * 1000000) // (count(*) * s_all)
        |    AS BIGINT) AS impact_ratio_ppm,
        |  sum(sel) * n_all * 5 < s_all * count(*) * 4 AS flagged
        |FROM g, o GROUP BY lang, n_all, s_all ORDER BY lang"""
        .stripMargin)))
}
