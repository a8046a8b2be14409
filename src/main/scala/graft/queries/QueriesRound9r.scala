package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-9 eighteenth batch: vocabulary-growth estimation
  * (Good-Turing / Chao1) and confounder-adjusted effect measurement
  * (Mantel–Haenszel).
  */
object QueriesRound9r {

  val defs: Seq[QueryDef] = Seq(

    // ---- q523: Good-Turing unseen mass + Chao1 richness -----------------------
    // "How much vocabulary haven't we crawled yet?" — the question
    // behind every corpus-expansion budget. Good-Turing: unseen
    // probability mass ≈ N₁/N (singleton share), adjusted counts
    // r* = (r+1)·N_{r+1}/N_r; Chao1 richness: V + N₁²/(2N₂) — all
    // from ONE freq-of-freqs table (two hash aggs: shingle counts,
    // then count-of-counts; O(distinct counts) rows after the second,
    // so the readout frame is tiny at any corpus size). The unit is
    // the 3-token shingle, NOT the unigram — this synthetic corpus
    // draws from a 31-word vocabulary whose unigram spectrum has zero
    // singletons (measured), so the unigram statistic would be
    // vacuous; the trigram space is combinatorial and carries a real
    // spectrum (9.4k singletons of 16.2k types at sf0.01). Completes
    // the vocab family: q427 measures the Zipf SLOPE, q204 OOV
    // against a fixed vocab, this lane the growth FORECAST. Exact
    // integer ppm throughout.
    QueryDef("q523_vocab_growth",
      (s, d) => {
        // tokenize ONCE behind an exchange barrier (the q430
        // discipline): inlined, CollapseProject re-runs the regexp
        // tokenization in every shingle-slice lambda position —
        // measured 10.6 s vs 3.4 s for this lane at sf0.1
        val counts = documents(s, d)
          .select(col("doc_id"), graft.ops.Text.tokens(col("text")).as("__toks"))
          .repartition(col("doc_id"))
          .select(explode(graft.ops.Dedup.wordShingles(col("__toks"), 3))
            .as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("r"))
        val fof = counts.groupBy("r").agg(count(lit(1)).as("nr"))
        fof.agg(
          sum("nr").as("v"),
          sum(expr("r * nr")).as("n"),
          sum(when(col("r") === 1, col("nr")).otherwise(0L)).as("n1"),
          sum(when(col("r") === 2, col("nr")).otherwise(0L)).as("n2"),
          sum(when(col("r") === 3, col("nr")).otherwise(0L)).as("n3"),
          sum(when(col("r") === 4, col("nr")).otherwise(0L)).as("n4"))
          .select(col("v"), col("n"), col("n1"), col("n2"),
            expr("n1 * 1000000 div n").as("unseen_mass_ppm"),
            expr("v + n1 * n1 div greatest(2 * n2, 1L)").as("chao1"),
            expr("2 * n2 * 1000000 div greatest(n1, 1L)").as("rstar1_micro"),
            expr("3 * n3 * 1000000 div greatest(n2, 1L)").as("rstar2_micro"),
            expr("4 * n4 * 1000000 div greatest(n3, 1L)").as("rstar3_micro"))
      },
      Some(s"""WITH tt AS (SELECT ${DuckSql.toks("text")} AS tks
        |  FROM documents),
        |t AS (SELECT unnest(${DuckSql.shingles("tks", 3)}) AS tok FROM tt),
        |c AS (SELECT tok, count(*) AS r FROM t GROUP BY 1),
        |fof AS (SELECT r, count(*) AS nr FROM c GROUP BY 1),
        |a AS (SELECT CAST(sum(nr) AS BIGINT) AS v,
        |    CAST(sum(r * nr) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN r = 1 THEN nr ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN r = 2 THEN nr ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN r = 3 THEN nr ELSE 0 END) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN r = 4 THEN nr ELSE 0 END) AS BIGINT) AS n4
        |  FROM fof)
        |SELECT v, n, n1, n2,
        |  n1 * 1000000 // n AS unseen_mass_ppm,
        |  v + n1 * n1 // greatest(2 * n2, 1) AS chao1,
        |  2 * n2 * 1000000 // greatest(n1, 1) AS rstar1_micro,
        |  3 * n3 * 1000000 // greatest(n2, 1) AS rstar2_micro,
        |  4 * n4 * 1000000 // greatest(n3, 1) AS rstar3_micro
        |FROM a""".stripMargin)),

    // ---- q524: Mantel-Haenszel stratified odds ratio ---------------------------
    // The Simpson's-paradox guard for curation policy: does the
    // "even-numbered sources pass the length gate more often" effect
    // survive stratification by language, or is it a lang-mix
    // artifact? Crude pooled OR next to the Mantel-Haenszel
    // lang-adjusted OR. Per-stratum 2×2 cells come from ONE scan;
    // the MH sums weight each stratum by 1/n_i — kept deterministic
    // as fixed-point floor at 2²⁰ per stratum (documented metric;
    // Spark `div` ≡ DuckDB `//` on the non-negative terms), so the
    // whole audit is integer and hash-stable.
    QueryDef("q524_mantel_haenszel",
      (s, d) => {
        val cells = documents(s, d).select(col("lang"),
          (expr("CAST(substring(source, 4, 10) AS INT) % 2") === 0)
            .as("exposed"),
          (col("n_chars") >= 300).as("pass"))
          .groupBy("lang")
          .agg(
            sum(when(col("exposed") && col("pass"), 1L).otherwise(0L)).as("a"),
            sum(when(col("exposed") && !col("pass"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("exposed") && col("pass"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("exposed") && !col("pass"), 1L).otherwise(0L)).as("dd"))
          .withColumn("nst", expr("a + b + c + dd"))
        val strata = cells.select(col("lang"), col("a"), col("b"),
          col("c"), col("dd"), col("nst"),
          expr("a * dd * 1048576 div nst").as("num_fp"),
          expr("b * c * 1048576 div nst").as("den_fp"))
        val mh = strata.agg(
          sum("a").as("ta"), sum("b").as("tb"), sum("c").as("tc"),
          sum("dd").as("td"),
          sum("num_fp").as("num"), sum("den_fp").as("den"))
          .select(
            expr("ta * td * 1000 div greatest(tb * tc, 1L)")
              .as("crude_or_milli"),
            expr("num * 1000 div greatest(den, 1L)").as("mh_or_milli"))
        strata.select(col("lang"), col("a"), col("b"), col("c"),
          col("dd").as("d"),
          expr("a * dd * 1000 div greatest(b * c, 1L)").as("or_milli"))
          .crossJoin(broadcast(mh))
          .orderBy("lang")
      },
      Some("""WITH base AS (SELECT lang,
        |    CAST(substring(source, 4, 10) AS INTEGER) % 2 = 0 AS exposed,
        |    n_chars >= 300 AS pass FROM documents),
        |cells AS (SELECT lang,
        |    CAST(sum(CASE WHEN exposed AND pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN exposed AND NOT pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT exposed AND pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT exposed AND NOT pass THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM base GROUP BY 1),
        |strata AS (SELECT lang, a, b, c, d, a + b + c + d AS nst,
        |    a * d * 1048576 // (a + b + c + d) AS num_fp,
        |    b * c * 1048576 // (a + b + c + d) AS den_fp
        |  FROM cells),
        |mh AS (SELECT
        |    sum(a) * sum(d) * 1000 // greatest(sum(b) * sum(c), 1)
        |      AS crude_or_milli,
        |    sum(num_fp) * 1000 // greatest(sum(den_fp), 1) AS mh_or_milli
        |  FROM strata)
        |SELECT s.lang, s.a, s.b, s.c, s.d,
        |  s.a * s.d * 1000 // greatest(s.b * s.c, 1) AS or_milli,
        |  CAST(mh.crude_or_milli AS BIGINT) AS crude_or_milli,
        |  CAST(mh.mh_or_milli AS BIGINT) AS mh_or_milli
        |FROM strata s, mh ORDER BY s.lang""".stripMargin))
  )
}
