package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 seventeenth batch: small-sample robustness for per-group
  * curation thresholds — hierarchical quantile fallback (q485) and
  * empirical-Bayes shrunken group means (q486). Rare groups are where
  * naive per-group statistics silently go wild; these are the two
  * standard defenses, in exact integers.
  */
object QueriesRound8q {

  val defs: Seq[QueryDef] = Seq(

    // ---- q485: hierarchical quantile fallback -----------------------------
    // Per-language P90 length thresholds (the q182 percentile-gate
    // input) go unstable for rare languages; the standard fix is
    // hierarchical fallback — use the group's own P90 only when the
    // group is big enough (n ≥ 30), else borrow the GLOBAL P90. Both
    // quantiles are exact order statistics from count-histogram cums
    // (the q332/q357 discipline: windows over O(distinct values)
    // frames, never a corpus sort); rank = ceil(0.9·n) in pure
    // integers. Output: per lang, its own P90 (always reported), the
    // threshold actually used, and the borrowed flag.
    QueryDef("q485_hierarchical_p90",
      (s, d) => {
        val docs = documents(s, d)
          .select(col("lang"), col("n_chars").cast("long").as("v"))
        def p90(df: org.apache.spark.sql.DataFrame,
                part: Seq[String]): org.apache.spark.sql.DataFrame = {
          val keys = part.map(col)
          val hist = df.groupBy(keys :+ col("v"): _*)
            .agg(count(lit(1)).as("__c"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(part.map(col): _*).orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
          val wAll = org.apache.spark.sql.expressions.Window
            .partitionBy(part.map(col): _*)
          hist.withColumn("__cum", sum("__c").over(w))
            .withColumn("__n", sum("__c").over(wAll))
            .where(col("__cum") * 10 >= col("__n") * 9)
            .groupBy(keys :+ col("__n").as("n"): _*)
            .agg(min("v").as("p90"))
        }
        val per = p90(docs, Seq("lang"))
        val glob = p90(docs.select(lit(1).as("__g"), col("v")), Seq("__g"))
          .select(col("p90").as("global_p90"))
        per.crossJoin(broadcast(glob))
          .select(col("lang"), col("n"), col("p90").as("own_p90"),
            col("global_p90"),
            when(col("n") >= 30, col("p90")).otherwise(col("global_p90"))
              .as("used_p90"),
            (col("n") < 30).as("borrowed"))
          .orderBy("lang")
      },
      Some("""WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS v
        |  FROM documents),
        |h AS (SELECT lang, v, count(*) AS c FROM d GROUP BY 1, 2),
        |cum AS (SELECT lang, v,
        |    sum(c) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |pg AS (SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |    CAST(min(v) AS BIGINT) AS own_p90
        |  FROM cum WHERE cc * 10 >= n * 9 GROUP BY 1),
        |gh AS (SELECT v, count(*) AS c FROM d GROUP BY 1),
        |gc AS (SELECT v,
        |    sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
        |    sum(c) OVER () AS n
        |  FROM gh),
        |gp AS (SELECT CAST(min(v) AS BIGINT) AS global_p90 FROM gc
        |  WHERE cc * 10 >= n * 9)
        |SELECT lang, n, own_p90, gp.global_p90,
        |  CASE WHEN n >= 30 THEN own_p90 ELSE gp.global_p90 END
        |    AS used_p90,
        |  n < 30 AS borrowed
        |FROM pg, gp ORDER BY lang""".stripMargin)),

    // ---- q486: empirical-Bayes shrunken group means ------------------------
    // The James–Stein-flavored fix for noisy per-source averages:
    // blend each source's mean toward the global mean with weight
    // n/(n+k) (k = 20 pseudo-observations) — tiny sources land near
    // the prior, big sources keep their data. Entirely exact:
    // blended = (S_g·N + k·S_tot·1) over ... kept as ONE integer
    // expression, micro-quantized once:
    // mean_micro = (S_g·N_tot + k·S_tot)·10⁶ div ((n_g + k)·N_tot)
    // where the k·S_tot/N_tot prior term stays a cross-multiplied
    // rational — no float mean ever computed. One aggregation to the
    // O(sources) frame; shrinkage arithmetic is frame-local.
    QueryDef("q486_shrunken_means",
      (s, d) => {
        val per = documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast("long")).as("s"))
        per
          .withColumn("n_tot", expr("sum(n) OVER ()"))
          .withColumn("s_tot", expr("sum(s) OVER ()"))
          .select(col("source"), col("n"),
            expr("(s * 1000000) div n").as("raw_mean_micro"),
            expr("(s_tot * 1000000) div n_tot").as("global_mean_micro"),
            expr("((s * n_tot + 20 * s_tot) * 1000000) div " +
              "((n + 20) * n_tot)").as("shrunk_mean_micro"))
          .withColumn("shift_micro",
            col("shrunk_mean_micro") - col("raw_mean_micro"))
          .orderBy("source")
      },
      Some("""WITH p AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
        |    CAST(sum(s) AS BIGINT) AS s_tot FROM p)
        |SELECT source, n,
        |  CAST((s * 1000000) // n AS BIGINT) AS raw_mean_micro,
        |  CAST((s_tot * 1000000) // n_tot AS BIGINT) AS global_mean_micro,
        |  CAST(((s * n_tot + 20 * s_tot) * 1000000) //
        |    ((n + 20) * n_tot) AS BIGINT) AS shrunk_mean_micro,
        |  CAST(((s * n_tot + 20 * s_tot) * 1000000) //
        |    ((n + 20) * n_tot) - (s * 1000000) // n AS BIGINT)
        |    AS shift_micro
        |FROM p, t ORDER BY source""".stripMargin))
  )
}
