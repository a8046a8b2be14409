package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-7 thirty-sixth batch: the McNemar shadow-deployment test and
  * the pipeline lineage ledger.
  */
object QueriesRound7aj {

  val defs: Seq[QueryDef] = Seq(

    // ---- q411: McNemar test for a shadow deployment ---------------------
    // The decision gate for "ship the new filter?": current gate
    // (chars ≥ 200) vs shadow gate (tokens ≥ 40) on the same docs —
    // the 2×2 agreement table, the flip rate, and McNemar's statistic
    // (b−c)²·10⁶ div (b+c) on the DISCORDANT cells only (concordant
    // pairs carry no information about a marginal change — the whole
    // point of the paired test; q391 gives the CI, this gives the
    // hypothesis test). χ² > 3.84 ⟺ p < 0.05 under H0; the
    // comparison is exact integers, the threshold check a boolean
    // column. One scan, O(1) readout.
    QueryDef("q411_mcnemar_shadow",
      (s, d) => {
        val g = documents(s, d).select(
          when(col("n_chars") >= 200, 1L).otherwise(0L).as("a"),
          when(size(Text.tokens(col("text"))) >= 40, 1L).otherwise(0L)
            .as("b"))
        g.agg(count(lit(1)).as("n"),
            sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
              .as("n_both"),
            sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
              .as("only_current"),
            sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
              .as("only_shadow"),
            sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L))
              .as("neither"))
          .select(col("n"), col("n_both"), col("only_current"),
            col("only_shadow"), col("neither"),
            expr("((only_current + only_shadow) * 1000000) div n")
              .as("flip_ppm"),
            expr("CASE WHEN only_current + only_shadow > 0 THEN" +
              " ((only_current - only_shadow) * (only_current -" +
              " only_shadow) * 1000000) div (only_current + only_shadow)" +
              " END").as("mcnemar_chi2_micro"),
            expr("CASE WHEN only_current + only_shadow > 0 THEN" +
              " (only_current - only_shadow) * (only_current -" +
              " only_shadow) * 1000000 > 3841459 * (only_current +" +
              " only_shadow) END").as("significant_05"))
      },
      Some(s"""WITH g AS (SELECT
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN len(${DuckSql.toks("text")}) >= 40
        |      THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |t AS (SELECT count(*) AS n,
        |    sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS oc,
        |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS os,
        |    sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS neither
        |  FROM g)
        |SELECT CAST(n AS BIGINT) AS n, CAST(nb AS BIGINT) AS n_both,
        |  CAST(oc AS BIGINT) AS only_current,
        |  CAST(os AS BIGINT) AS only_shadow,
        |  CAST(neither AS BIGINT) AS neither,
        |  CAST(((oc + os) * 1000000) // n AS BIGINT) AS flip_ppm,
        |  CAST(CASE WHEN oc + os > 0 THEN
        |    ((oc - os) * (oc - os) * 1000000) // (oc + os) END
        |    AS BIGINT) AS mcnemar_chi2_micro,
        |  CASE WHEN oc + os > 0 THEN
        |    (oc - os) * (oc - os) * 1000000 > 3841459 * (oc + os) END
        |    AS significant_05
        |FROM t""".stripMargin)),

    // ---- q412: pipeline lineage ledger ----------------------------------
    // Provenance for a 3-stage curation pipeline (raw documents →
    // length-gated → per-source aggregate), each stage fingerprinted
    // with the q360 order-independent fold and recorded with its row
    // count and its PARENT's fingerprint — the ledger that lets any
    // downstream artifact be traced to the exact upstream bytes that
    // produced it (and any silent upstream change be caught by one
    // string compare). Stages share one scan lineage; fingerprints
    // are columns, so the ledger itself sits under the hash gate.
    QueryDef("q412_lineage_ledger",
      (s, d) => {
        def fp(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
          df.select(Sampling.hashLong(concat_ws("|",
              cols.map(c => col(c).cast("string")): _*)).as("__h"))
            .agg(count(lit(1)).as("n_rows"),
              expr("cast(sum(cast(__h as decimal(38,0))) as string)")
                .as("fp"))
        val raw = documents(s, d)
          .select("doc_id", "source", "n_chars")
        val gated = raw.where(col("n_chars") >= 200)
        val agg = gated.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
        val f0 = fp(raw, Seq("doc_id", "source", "n_chars"))
          .select(lit("1_raw").as("stage"), col("n_rows"), col("fp"))
        val f1 = fp(gated, Seq("doc_id", "source", "n_chars"))
          .select(lit("2_gated").as("stage"), col("n_rows"), col("fp"))
        val f2 = fp(agg, Seq("source", "n_docs", "chars"))
          .select(lit("3_agg").as("stage"), col("n_rows"), col("fp"))
        val chain = f0.unionByName(f1).unionByName(f2)
        val w = org.apache.spark.sql.expressions.Window.orderBy("stage")
        chain // O(3) frame: the lag window is ledger-sized
          .withColumn("parent_fp", lag("fp", 1).over(w))
          .orderBy("stage")
      },
      Some {
        val h0 = DuckSql.hashLong(
          "CAST(doc_id AS VARCHAR) || '|' || source || '|' ||" +
            " CAST(n_chars AS VARCHAR)")
        val h2 = DuckSql.hashLong(
          "source || '|' || CAST(n_docs AS VARCHAR) || '|' ||" +
            " CAST(chars AS VARCHAR)")
        s"""WITH raw AS (SELECT doc_id, source, n_chars FROM documents),
        |g AS (SELECT * FROM raw WHERE n_chars >= 200),
        |a AS (SELECT source, count(*) AS n_docs, sum(n_chars) AS chars
        |  FROM g GROUP BY 1),
        |f0 AS (SELECT '1_raw' AS stage, count(*) AS n_rows,
        |    CAST(sum(CAST(($h0) AS HUGEINT)) AS VARCHAR) AS fp FROM raw),
        |f1 AS (SELECT '2_gated', count(*),
        |    CAST(sum(CAST(($h0) AS HUGEINT)) AS VARCHAR) FROM g),
        |f2 AS (SELECT '3_agg', count(*),
        |    CAST(sum(CAST(($h2) AS HUGEINT)) AS VARCHAR) FROM a),
        |chain AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1
        |  UNION ALL SELECT * FROM f2)
        |SELECT stage, CAST(n_rows AS BIGINT) AS n_rows, fp,
        |  lag(fp) OVER (ORDER BY stage) AS parent_fp
        |FROM chain ORDER BY stage""".stripMargin
      }))
}
