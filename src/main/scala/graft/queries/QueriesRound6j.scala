package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Relational, Text}
import org.apache.spark.sql.functions._

/** Round-6 tenth batch: winnowing fingerprint selection (the MOSS
  * guarantee the mod-p sampler lacks), Unicode script detection over
  * planted multilingual text, and reciprocal-rank fusion of lexical
  * and embedding retrieval — the hybrid-search primitive.
  */
object QueriesRound6j {

  val defs: Seq[QueryDef] = Seq(

    // ---- q252: winnowing fingerprint selection -----------------------
    // MOSS-style robust fingerprinting (Dedup.winnowedFingerprints):
    // each 4-window of 4-token shingle hashes selects its min
    // (rightmost tie) via ONE packed-BIGINT window-min — hash·2²⁰ +
    // (2²⁰−1−pos) makes "min hash, then max pos" a plain numeric min
    // that any engine replays. Guarantee: a verbatim overlap of ≥ 7
    // tokens always shares a selected fingerprint. Per doc: totals,
    // selected count, cross-doc shared-selected count, density.
    QueryDef("q252_winnowing",
      (s, d) => Dedup.winnowedFingerprints(documents(s, d), "doc_id",
          "text", shingleN = 4, w = 4)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS toks
        |    FROM documents),
        |sh0 AS (SELECT doc_id, ${DuckSql.shingles("toks", 4)} AS shs FROM t),
        |sh AS (SELECT doc_id, unnest(generate_series(1, len(shs))) AS p1,
        |    shs FROM sh0 WHERE len(shs) > 0),
        |pk AS (SELECT doc_id, p1 - 1 AS p,
        |    ${DuckSql.hashLong("shs[p1]")} * 1048576
        |      + (1048575 - (p1 - 1)) AS packed
        |  FROM sh WHERE p1 - 1 < 1048575),
        |w AS (SELECT doc_id, p, min(packed) OVER (PARTITION BY doc_id
        |      ORDER BY p ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
        |    count(*) OVER (PARTITION BY doc_id) AS nw FROM pk),
        |sel AS (SELECT DISTINCT doc_id, mn // 1048576 AS h,
        |    1048575 - (mn % 1048576) AS pos FROM w WHERE p <= nw - 4),
        |shr AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS m
        |    FROM sel GROUP BY 1) x WHERE m > 1),
        |pd AS (SELECT doc_id, count(*) AS n_selected,
        |    sum(CASE WHEN h IN (SELECT h FROM shr) THEN 1 ELSE 0 END)
        |      AS n_shared FROM sel GROUP BY 1),
        |cnt AS (SELECT doc_id, count(*) AS n_shingles FROM pk GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(greatest(coalesce(n_shingles, 0) - 3, 0) AS BIGINT)
        |    AS n_windows,
        |  CAST(coalesce(n_selected, 0) AS BIGINT) AS n_selected,
        |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared_selected,
        |  CAST((coalesce(n_selected, 0) * 1000000)
        |    // greatest(coalesce(n_shingles, 0), 1) AS BIGINT)
        |    AS density_ppm
        |FROM documents d LEFT JOIN cnt USING (doc_id)
        |LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    // ---- q253: Unicode script detection ------------------------------
    // Script-share routing for a multilingual corpus: every zh doc
    // gets a deterministic CJK tail (both engines append the identical
    // UTF-8 literal), then per-doc Latin and CJK character counts fall
    // out of the length-delta trick with LITERAL-endpoint character
    // classes ([A-Za-z], [一-龥]) — the same pattern text is valid in
    // both regex dialects, unlike \u escapes. Per lang: doc counts,
    // script character totals, CJK-dominant docs, CJK share of
    // lettered characters in ppm.
    QueryDef("q253_script_detection",
      (s, d) => {
        val planted = documents(s, d).withColumn("t",
          when(col("lang") === "zh",
            concat(col("text"), lit(" 中文語料質量評估分析")))
            .otherwise(col("text")))
        val scored = planted
          .withColumn("latin_n",
            length(col("t")) - length(regexp_replace(col("t"), "[A-Za-z]", "")))
          .withColumn("cjk_n",
            length(col("t")) - length(regexp_replace(col("t"), "[一-龥]", "")))
        scored.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("latin_n").as("latin_chars"),
            sum("cjk_n").as("cjk_chars"),
            sum(when(col("cjk_n") > col("latin_n"), 1L).otherwise(0L))
              .as("n_cjk_dominant"))
          .select(col("lang"), col("n_docs"), col("latin_chars"),
            col("cjk_chars"), col("n_cjk_dominant"),
            expr("(cjk_chars * 1000000) div greatest(latin_chars + cjk_chars, 1)")
              .as("cjk_share_ppm"))
          .orderBy("lang")
      },
      Some("""WITH pl AS (SELECT lang, CASE WHEN lang = 'zh'
        |    THEN text || ' 中文語料質量評估分析' ELSE text END AS t
        |  FROM documents),
        |sc AS (SELECT lang,
        |    length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
        |      AS latin_n,
        |    length(t) - length(regexp_replace(t, '[一-龥]', '', 'g'))
        |      AS cjk_n
        |  FROM pl)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(latin_n) AS BIGINT) AS latin_chars,
        |  CAST(sum(cjk_n) AS BIGINT) AS cjk_chars,
        |  CAST(sum(CASE WHEN cjk_n > latin_n THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cjk_dominant,
        |  CAST((sum(cjk_n) * 1000000)
        |    // greatest(sum(latin_n) + sum(cjk_n), 1) AS BIGINT)
        |    AS cjk_share_ppm
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- q254: reciprocal-rank fusion (hybrid retrieval) -------------
    // The hybrid-search merge: a lexical ranking (occurrences of the
    // query terms in the doc) and a semantic ranking (exact BIGINT
    // inner product of millis-quantized embeddings against the vec 0
    // probe — MIPS retrieval, no floats) fuse by RRF:
    // 10⁶ div (60 + rank), summed. Ranks break ties by doc_id, so the
    // whole fusion is integer-deterministic. Both rankings use the
    // two-level global rank (Relational.twoLevelRankDesc): a
    // histogram-cumsum strictly-greater term + per-score id-bucket
    // offsets + partitioned positions — no single-partition window of
    // the corpus anywhere in the plan (pinned in PlanSpec), for both
    // the tie-heavy lexical scores and the near-distinct dot scores.
    // Top 25 by fused score.
    QueryDef("q254_rrf_hybrid",
      (s, d) => {
        val toks = Text.tokens(col("text"))
        val lex = documents(s, d).select(col("doc_id"),
          size(filter(toks, x =>
            x === "spark" || x === "table" || x === "join"))
            .cast("long").as("lex_score"))
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d).select(col("vec_id"), qv.as("__q"))
        val probe = broadcast(emb.where(col("vec_id") === 0)
          .select(col("__q").as("__pq")))
        val sem = emb.crossJoin(probe)
          .select(col("vec_id").as("doc_id"),
            aggregate(zip_with(col("__q"), col("__pq"), (a, b) => a * b),
              lit(0L), (acc, v) => acc + v).as("dot"))
        val joined = lex.join(sem, Seq("doc_id"))
        val ranked = Relational.twoLevelRankDesc(
          Relational.twoLevelRankDesc(joined, "lex_score", "doc_id",
            4096L, "r_lex"),
          "dot", "doc_id", 4096L, "r_sem")
          .withColumn("fused_micro",
            expr("1000000 div (60 + r_lex) + 1000000 div (60 + r_sem)"))
        ranked.orderBy(col("fused_micro").desc, col("doc_id")).limit(25)
          .select("doc_id", "lex_score", "dot", "r_lex", "r_sem",
            "fused_micro")
      },
      Some(s"""WITH lex AS (SELECT doc_id,
        |    CAST(len(list_filter(${DuckSql.toks("text")},
        |      x -> x IN ('spark', 'table', 'join'))) AS BIGINT)
        |      AS lex_score
        |  FROM documents),
        |e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |probe AS (SELECT q AS pq FROM e WHERE vec_id = 0),
        |sem AS (SELECT vec_id AS doc_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(q)),
        |      i -> q[i] * pq[i])) AS BIGINT) AS dot
        |  FROM e, probe),
        |r AS (SELECT lex.doc_id, lex_score, dot,
        |    row_number() OVER (ORDER BY lex_score DESC, lex.doc_id)
        |      AS r_lex,
        |    row_number() OVER (ORDER BY dot DESC, lex.doc_id) AS r_sem
        |  FROM lex JOIN sem ON lex.doc_id = sem.doc_id)
        |SELECT doc_id, lex_score, dot,
        |  CAST(r_lex AS BIGINT) AS r_lex, CAST(r_sem AS BIGINT) AS r_sem,
        |  CAST(1000000 // (60 + r_lex) + 1000000 // (60 + r_sem)
        |    AS BIGINT) AS fused_micro
        |FROM r ORDER BY fused_micro DESC, doc_id LIMIT 25""".stripMargin)))
}
