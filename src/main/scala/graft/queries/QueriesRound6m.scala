package graft.queries

import graft.Tables._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-6 thirteenth batch: closing the dedup-quality loop — the
  * candidate stage measured against an EXACT gold standard, entirely
  * inside the oracle discipline.
  */
object QueriesRound6m {

  val defs: Seq[QueryDef] = Seq(

    // ---- q262: dedup candidate-stage precision/recall ----------------
    // The evaluation every production dedup pipeline needs: how well
    // does the cheap probabilistic candidate stage (q42's banded
    // 3-shingle MinHash-LSH) cover the TRUE near-duplicates? Ground
    // truth is itself exact and scale-sane — q210's prefix-filter join
    // (complete by the prefix theorem) at 5-shingle Jaccard >= 0.8.
    // TP/FP/FN come from two set joins on pair keys; precision and
    // recall land in integer ppm. One row, fully engine-replayable:
    // the oracle recomputes BOTH pipelines and must agree on every
    // count — a measured-recall claim that is itself hash-verified
    // (RECALL.md's ANN methodology applied to dedup).
    QueryDef("q262_dedup_pr_eval",
      (s, d) => {
        // decimated sample (doc_id % 2 = 0) keeps the two-pipeline
        // bench budget; the filter pushes to the scan and the oracle
        // replays it — eval semantics unchanged (measured on a sample)
        val docs = documents(s, d).where(col("doc_id") % 2 === 0)
        val gold = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
          num = 4, den = 5, shingleN = 5).select("id_a", "id_b")
        val cand = Dedup.lshCandidatePairs(docs, "doc_id", "text",
          QueriesDedup.ShingleN, QueriesDedup.K, QueriesDedup.Bands)
          .select("id_a", "id_b")
        gold.agg(count(lit(1)).as("n_gold"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .crossJoin(gold.join(cand, Seq("id_a", "id_b"))
            .agg(count(lit(1)).as("tp")))
          .select(col("n_gold"), col("n_cand"), col("tp"),
            (col("n_gold") - col("tp")).as("fn"),
            (col("n_cand") - col("tp")).as("fp"),
            expr("(tp * 1000000) div greatest(n_cand, 1)").as("precision_ppm"),
            expr("(tp * 1000000) div greatest(n_gold, 1)").as("recall_ppm"))
      },
      Some(s"""${QueriesDedup.lshCtes("(SELECT * FROM documents WHERE doc_id % 2 = 0)")},
        |tt AS (SELECT doc_id, ${DuckSql.toks("text")} AS tks FROM documents WHERE doc_id % 2 = 0),
        |tk AS (SELECT DISTINCT doc_id,
        |    unnest(list_distinct(${DuckSql.shingles("tks", 5)})) AS t
        |  FROM tt),
        |szx AS (SELECT doc_id, count(*) AS sz FROM tk GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    count(*) AS n_inter
        |  FROM tk a JOIN tk b ON a.t = b.t AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |gold AS (SELECT i.id_a, i.id_b FROM inter i
        |  JOIN szx za ON za.doc_id = i.id_a
        |  JOIN szx zb ON zb.doc_id = i.id_b
        |  WHERE 5 * i.n_inter >= 4 * (za.sz + zb.sz - i.n_inter)),
        |m AS (SELECT
        |    (SELECT count(*) FROM gold) AS n_gold,
        |    (SELECT count(*) FROM cand) AS n_cand,
        |    (SELECT count(*) FROM gold g JOIN cand c
        |      ON g.id_a = c.id_a AND g.id_b = c.id_b) AS tp)
        |SELECT CAST(n_gold AS BIGINT) AS n_gold,
        |  CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
        |  CAST(n_gold - tp AS BIGINT) AS fn,
        |  CAST(n_cand - tp AS BIGINT) AS fp,
        |  CAST((tp * 1000000) // greatest(n_cand, 1) AS BIGINT)
        |    AS precision_ppm,
        |  CAST((tp * 1000000) // greatest(n_gold, 1) AS BIGINT)
        |    AS recall_ppm
        |FROM m""".stripMargin)))
}
