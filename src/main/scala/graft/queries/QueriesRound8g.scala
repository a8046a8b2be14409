package graft.queries

import graft.Tables._
import graft.ops.{CorpusStats, FixedPoint, Text}
import org.apache.spark.sql.functions._

/** Round-8 seventh batch: corpus-statistics operators for data
  * curation — PMI collocation extraction, per-document code-switching
  * detection, and bigram-LM surprisal scoring (the statistical-LM
  * quality filter every web-corpus pipeline runs before training).
  * All three are exact-integer formulations (FixedPoint log) so the
  * DuckDB oracle hash-verifies every score.
  */
object QueriesRound8g {

  val defs: Seq[QueryDef] = Seq(

    // ---- q443: PMI collocation extraction ---------------------------------
    // Pointwise mutual information over adjacent-token bigrams:
    // PMI(w1,w2) = ln(p(w1,w2) / (p(w1)p(w2))) with p from corpus
    // counts — the classic collocation detector ("new york" vs "of
    // the"). Exact-integer: the ratio (c12·N²)/(B·c1·c2) goes through
    // the shared fixed-point log, positive-PMI + min-count gates keep
    // the log input ≥ 1 by algebra. Scale shape: one token explode
    // (tokenized ONCE behind the exchange barrier — the generator
    // recompute trap), two O(vocab) count frames, bigram→unigram
    // equi-joins on the word key (AQE broadcasts the small side),
    // never token×token. The N² product bounds: at ~10⁹-token shards
    // the BIGINT headroom holds; beyond that the same formulation
    // runs per-shard with count frames merged by sum (documented in
    // DESIGN.md — counts are mergeable summaries).
    QueryDef("q443_pmi_collocations",
      (s, d) => CorpusStats.pmiCollocations(
        documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
          .repartition(col("doc_id")),
        "__toks", minCount = 3, topK = 50),
      Some {
        val pmi = FixedPoint.duckLnMicroFp20(FixedPoint.duckRatioFp20(
          "(c12 * nn * nn - bb * c1 * c2)", "(bb * c1 * c2)"))
        s"""WITH tk AS (SELECT doc_id, ${DuckSql.toks("text")} AS t
        |  FROM documents),
        |uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(t) AS tok FROM tk) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM uni),
        |big AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM (
        |    SELECT unnest(${DuckSql.shingles("t", 2)}) AS bg FROM tk)
        |  GROUP BY 1),
        |totb AS (SELECT CAST(sum(c12) AS BIGINT) AS bb FROM big),
        |k AS (SELECT split_part(bg, ' ', 1) AS w1,
        |    split_part(bg, ' ', 2) AS w2, c12 FROM big),
        |j AS (SELECT k.w1, k.w2, k.c12, u1.c AS c1, u2.c AS c2, nn, bb
        |  FROM k JOIN uni u1 ON k.w1 = u1.w
        |  JOIN uni u2 ON k.w2 = u2.w, tot, totb)
        |SELECT w1, w2, c12, c1, c2, CAST($pmi AS BIGINT) AS pmi_micro
        |FROM j WHERE c12 >= 3 AND c12 * nn * nn > bb * c1 * c2
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 50""".stripMargin
      }),

    // ---- q444: code-switching detection -----------------------------------
    // Per document: classify each raw token by the language stopword
    // lists (first match in sorted-language order — deterministic on
    // ambiguous markers like "que"), collapse consecutive evidence
    // tokens of one language into segments, and call a doc
    // code-switched when it carries ≥ 2 segments. Per-source rollout:
    // evidence coverage, switched-doc count and ppm, segment totals —
    // the signal that routes mixed-language docs away from
    // single-language training mixes. Scale shape: one posexplode,
    // per-DOC windows only (lag over (doc_id, p) — bounded by doc
    // length, never a global window), two O(sources) rollups.
    QueryDef("q444_code_switching",
      (s, d) => {
        val perDoc = CorpusStats.codeSwitchSegments(
          documents(s, d)
            .select(col("doc_id"), col("source"),
              Text.rawTokens(col("text")).as("__toks"))
            .repartition(col("doc_id")),
          "doc_id", "__toks", keep = Seq("source"))
        val totDocs = documents(s, d).groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        val bySrc = perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_evidence_docs"),
            sum(when(col("n_seg") >= 2, lit(1L)).otherwise(lit(0L)))
              .as("n_switched"),
            max("n_seg").as("max_segments"),
            sum("n_seg").as("sum_segments"))
        totDocs.join(bySrc, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_evidence_docs"), lit(0L)).as("n_evidence_docs"),
            coalesce(col("n_switched"), lit(0L)).as("n_switched"),
            expr("CASE WHEN coalesce(n_evidence_docs, 0L) = 0L THEN 0L" +
              " ELSE (n_switched * 1000000) div n_evidence_docs END")
              .as("switch_ppm"),
            coalesce(col("max_segments"), lit(0L)).as("max_segments"),
            coalesce(col("sum_segments"), lit(0L)).as("sum_segments"))
          .orderBy("source")
      },
      Some {
        val cases = Text.stopwords.toSeq.sortBy(_._1).map { case (lg, words) =>
          val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"WHEN list_contains($list, u.tok) THEN '$lg'"
        }.mkString("\n      ")
        s"""WITH t AS (SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
        |      x -> length(x) > 0) AS rt FROM documents),
        |e0 AS (SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(rt)),
        |      i -> struct_pack(p := i, tok := rt[i]))) AS u FROM t),
        |ev AS (SELECT doc_id, source, u.p AS p,
        |    CASE $cases END AS lg
        |  FROM e0),
        |ev2 AS (SELECT * FROM ev WHERE lg IS NOT NULL),
        |seg AS (SELECT doc_id, source,
        |    CASE WHEN lag(lg) OVER (PARTITION BY doc_id ORDER BY p)
        |      IS DISTINCT FROM lg THEN 1 ELSE 0 END AS st
        |  FROM ev2),
        |pd AS (SELECT doc_id, source, count(*) AS n_ev, sum(st) AS n_seg
        |  FROM seg GROUP BY 1, 2),
        |td AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |bs AS (SELECT source, count(*) AS n_evidence_docs,
        |    sum(CASE WHEN n_seg >= 2 THEN 1 ELSE 0 END) AS n_switched,
        |    max(n_seg) AS max_segments, sum(n_seg) AS sum_segments
        |  FROM pd GROUP BY 1)
        |SELECT td.source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(coalesce(n_evidence_docs, 0) AS BIGINT) AS n_evidence_docs,
        |  CAST(coalesce(n_switched, 0) AS BIGINT) AS n_switched,
        |  CAST(CASE WHEN coalesce(n_evidence_docs, 0) = 0 THEN 0
        |    ELSE (n_switched * 1000000) // n_evidence_docs END AS BIGINT)
        |    AS switch_ppm,
        |  CAST(coalesce(max_segments, 0) AS BIGINT) AS max_segments,
        |  CAST(coalesce(sum_segments, 0) AS BIGINT) AS sum_segments
        |FROM td LEFT JOIN bs ON td.source = bs.source
        |ORDER BY td.source""".stripMargin
      }),

    // ---- q445: bigram-LM surprisal scoring --------------------------------
    // The statistical-LM quality filter (the CCNet/Wikipedia-LM
    // pattern): score every document by its mean token surprisal
    // under an add-one-smoothed corpus bigram model, ln((c1 + V) /
    // (c12 + 1)) per position — low surprisal ≈ fluent/common text,
    // high ≈ boilerplate or noise. Exact-integer: c12 ≤ c1 keeps the
    // ratio ≥ 1 by algebra, every per-position term and every per-doc
    // mean is a BIGINT through the shared fixed-point log. Scale
    // shape: occurrence→count equi-joins on the bigram and history
    // keys (shuffles bounded by corpus token count), per-doc mean via
    // one hash agg, O(sources) readout. Model counts are mergeable
    // (sum) — a 100 TB corpus trains the LM per-shard and merges.
    QueryDef("q445_bigram_lm_perplexity",
      (s, d) => {
        val perDoc = CorpusStats.bigramSurprisal(
          documents(s, d)
            .select(col("doc_id"), col("source"),
              Text.tokens(col("text")).as("__toks"))
            .repartition(col("doc_id")),
          "doc_id", "__toks", keep = Seq("source"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("doc_sup_micro").as("s"),
            max("doc_sup_micro").as("max_surprisal_micro"),
            min("doc_sup_micro").as("min_surprisal_micro"))
          .select(col("source"), col("n_docs"),
            expr("s div n_docs").as("mean_surprisal_micro"),
            col("max_surprisal_micro"), col("min_surprisal_micro"))
          .orderBy("source")
      },
      Some {
        val sup = FixedPoint.duckLnMicroFp20(FixedPoint.duckRatioFp20(
          "(c1 + vv - c12 - 1)", "(c12 + 1)"))
        s"""WITH tk AS (SELECT doc_id, source, ${DuckSql.toks("text")} AS t
        |  FROM documents),
        |uni AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c1 FROM (
        |    SELECT unnest(t) AS tok FROM tk) GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vv FROM uni),
        |occ AS (SELECT doc_id, source,
        |    unnest(${DuckSql.shingles("t", 2)}) AS bg FROM tk),
        |big AS (SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM occ
        |  GROUP BY 1),
        |j AS (SELECT o.doc_id, o.source, b.c12, u.c1, vv
        |  FROM occ o JOIN big b USING (bg)
        |  JOIN uni u ON split_part(o.bg, ' ', 1) = u.w, v),
        |pp AS (SELECT doc_id, source, CAST($sup AS BIGINT) AS sup FROM j),
        |pd AS (SELECT doc_id, source,
        |    CAST(sum(sup) // count(*) AS BIGINT) AS doc_sup_micro
        |  FROM pp GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_sup_micro) // count(*) AS BIGINT)
        |    AS mean_surprisal_micro,
        |  CAST(max(doc_sup_micro) AS BIGINT) AS max_surprisal_micro,
        |  CAST(min(doc_sup_micro) AS BIGINT) AS min_surprisal_micro
        |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin
      }))
}
