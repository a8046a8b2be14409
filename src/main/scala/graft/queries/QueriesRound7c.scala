package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Graph, Text}
import org.apache.spark.sql.functions._

/** Round-7 third batch: t-closeness (the distributional member of the
  * privacy lane next to q249 k-anonymity and q267 l-diversity), local
  * clustering coefficient (the per-node cohesion readout next to
  * q269's per-edge k-truss), Flesch–Kincaid readability (the classic
  * heuristic quality signal next to the Gopher rules), and event-motif
  * mining over per-user traces (regex patterns over a total-ordered
  * symbol string — the "MATCH_RECOGNIZE" shape next to q66's ordered
  * funnel and q296's adjacent transitions).
  */
object QueriesRound7c {

  val defs: Seq[QueryDef] = Seq(

    // ---- q298: t-closeness audit ---------------------------------------
    // k-anonymity (q249) bounds class size and l-diversity (q267)
    // bounds distinct sensitive values, but a class can satisfy both
    // while its sensitive DISTRIBUTION still leaks (90% one disease in
    // a class vs 10% globally). t-closeness (Li et al. 2007) bounds
    // the distance between each class's sensitive distribution and the
    // global one; for a categorical attribute under the equal-distance
    // ground metric, EMD = ½·Σ_v |p_class(v) − p_global(v)|. All
    // integer: cross-multiplied counts |cv·N − gv·n_c| summed per
    // class, then one floor division to ppm. Frames are O(classes ×
    // |sensitive domain|) — the 7-row global distribution broadcasts
    // into a grid join, never a per-row scan. Overflow headroom:
    // numerator ≤ 2·n_c·N, so ppm math needs n_c·N·10⁶ < 2⁶³ —
    // holds to N ≈ 3·10⁶ per class; beyond that, divide shares to ppm
    // per value BEFORE summing (costs ≤ |domain| ulps of exactness).
    QueryDef("q298_t_closeness",
      (s, d) => {
        val base = documents(s, d).select(col("lang"), col("source"),
          expr("(n_chars div 100) * 100").as("chars_bucket"),
          (col("n_chars") % 7).as("sensitive"))
        val cv = base
          .groupBy("lang", "source", "chars_bucket", "sensitive")
          .agg(count(lit(1)).as("cv"))
        val cls = cv.groupBy("lang", "source", "chars_bucket")
          .agg(sum("cv").as("class_size"))
        // global sensitive distribution: |domain| = 7 rows; the total
        // window runs over that 7-row frame only
        val g = base.groupBy("sensitive").agg(count(lit(1)).as("gv"))
          .withColumn("total", sum("gv").over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(lit(1))))
        cls.join(broadcast(g))
          .join(cv, Seq("lang", "source", "chars_bucket", "sensitive"),
            "left")
          .withColumn("cv", coalesce(col("cv"), lit(0L)))
          .groupBy("lang", "source", "chars_bucket", "class_size",
            "total")
          .agg(sum(abs(col("cv") * col("total")
            - col("gv") * col("class_size"))).as("num"))
          .select(col("lang"), col("source"), col("chars_bucket"),
            col("class_size"),
            expr("(num * 1000000) div (2 * class_size * total)")
              .as("emd_ppm"))
          .withColumn("violates_t03", col("emd_ppm") > 300000L)
          .orderBy("lang", "source", "chars_bucket")
      },
      Some("""WITH base AS (SELECT lang, source,
        |    (n_chars // 100) * 100 AS chars_bucket,
        |    n_chars % 7 AS sensitive FROM documents),
        |cv AS (SELECT lang, source, chars_bucket, sensitive,
        |    count(*) AS cv FROM base GROUP BY 1, 2, 3, 4),
        |cls AS (SELECT lang, source, chars_bucket, sum(cv) AS class_size
        |  FROM cv GROUP BY 1, 2, 3),
        |g AS (SELECT sensitive, count(*) AS gv,
        |    sum(count(*)) OVER () AS total FROM base GROUP BY 1),
        |grid AS (SELECT c.lang, c.source, c.chars_bucket, c.class_size,
        |    g.total, g.gv, coalesce(cv.cv, 0) AS cv
        |  FROM cls c CROSS JOIN g
        |  LEFT JOIN cv ON cv.lang = c.lang AND cv.source = c.source
        |    AND cv.chars_bucket = c.chars_bucket
        |    AND cv.sensitive = g.sensitive),
        |emd AS (SELECT lang, source, chars_bucket, class_size, total,
        |    sum(abs(cv * total - gv * class_size)) AS num
        |  FROM grid GROUP BY 1, 2, 3, 4, 5)
        |SELECT lang, source, CAST(chars_bucket AS BIGINT) AS chars_bucket,
        |  CAST(class_size AS BIGINT) AS class_size,
        |  CAST((num * 1000000) // (2 * class_size * total) AS BIGINT)
        |    AS emd_ppm,
        |  (num * 1000000) // (2 * class_size * total) > 300000
        |    AS violates_t03
        |FROM emd ORDER BY 1, 2, 3""".stripMargin)),

    // ---- q300: local clustering coefficient ----------------------------
    // Per-node neighborhood cohesion over the q269 fuzzy-blocked part
    // graph: cc(v) = 2·tri(v)/(deg(v)·(deg(v)−1)) in exact ppm. The
    // k-truss (q269) corroborates EDGES; the clustering coefficient
    // scores NODES — near-1 nodes sit in tight duplicate cliques
    // (merge-safe), near-0 high-degree nodes are hubs chaining
    // unrelated matches (the ER over-merge signal). Same strict-
    // orientation triangle join, each triangle counted once and
    // credited to its three corners via one map-side-combined union
    // aggregation; the oracle replays triangles + degrees as CTEs.
    QueryDef("q300_clustering_coefficient",
      (s, d) => Graph.clusteringCoefficient(
          Dedup.fuzzyPairsBlocked(part(s, d), "p_partkey", "p_name",
            Seq("p_brand", "p_size"), 6))
        .orderBy("id"),
      Some("""WITH e AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        |  FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |    AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 6),
        |t AS (SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
        |  FROM e e1 JOIN e e2 ON e1.id_b = e2.id_a
        |  JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
        |tri AS (SELECT id, count(*) AS n_tri FROM (
        |  SELECT x AS id FROM t
        |  UNION ALL SELECT y FROM t
        |  UNION ALL SELECT z FROM t) GROUP BY 1),
        |deg AS (SELECT id, count(*) AS degree FROM (
        |  SELECT id_a AS id FROM e
        |  UNION ALL SELECT id_b FROM e) GROUP BY 1)
        |SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
        |  CAST(coalesce(tri.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(CASE WHEN d.degree >= 2
        |    THEN (coalesce(tri.n_tri, 0) * 2000000)
        |      // (d.degree * (d.degree - 1))
        |    ELSE 0 END AS BIGINT) AS cc_ppm
        |FROM deg d LEFT JOIN tri USING (id) ORDER BY d.id""".stripMargin)),

    // ---- q301: Flesch–Kincaid readability ------------------------------
    // The classic readability heuristic as a quality signal next to
    // the Gopher repetition rules (q175) and stopword/entropy gates:
    // grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59.
    // Everything integer: words = the engine's token count, sentences
    // = runs of [.!?] (min 1), syllables = vowel-group runs in the
    // lowercased text (the standard cheap estimator; vowel-less tokens
    // contribute 0 by construction, identically in both engines). The
    // two ratio terms floor-divide in micro-units independently —
    // deterministic on both sides, no float anywhere. One corpus scan,
    // three regexp counters per row, no shuffle before the final sort.
    QueryDef("q301_readability",
      (s, d) => documents(s, d).select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n_words"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .cast("long").as("n_sents"),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))
            .cast("long").as("n_syll"))
        .withColumn("fk_micro",
          expr("(390000 * n_words) div n_sents"
            + " + (11800000 * n_syll) div greatest(n_words, 1)"
            + " - 15590000"))
        .withColumn("college_plus", col("fk_micro") > 12000000L)
        .orderBy("doc_id"),
      Some(s"""WITH m AS (SELECT doc_id,
        |    len(${DuckSql.toks("text")}) AS n_words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS n_sents,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sents AS BIGINT) AS n_sents,
        |  CAST(n_syll AS BIGINT) AS n_syll,
        |  CAST((390000 * n_words) // n_sents
        |    + (11800000 * n_syll) // greatest(n_words, 1)
        |    - 15590000 AS BIGINT) AS fk_micro,
        |  (390000 * n_words) // n_sents
        |    + (11800000 * n_syll) // greatest(n_words, 1)
        |    - 15590000 > 12000000 AS college_plus
        |FROM m ORDER BY doc_id""".stripMargin)),

    // ---- q302: event-motif mining over per-user traces -----------------
    // Sequence patterns beyond adjacent pairs (q296) and the fixed
    // funnel (q66): each user's events collapse — in (ts, event_id)
    // total order — to a symbol string (event types here start with
    // distinct letters: c/e/p/s/v), and motifs are regex counts over
    // that string: view-run→click (browse-then-act), click→purchase
    // (conversion step), v+cp (full funnel with arbitrary browsing),
    // ee (repeated errors — the retry-storm signal). Non-overlapping
    // leftmost-match counting is identical in Java regex and RE2 for
    // these patterns. State per user is one bounded trace (users are
    // bounded actors; at corpus scale a per-key length cap rides the
    // collect_list the way q140's session cap does) — one shuffle to
    // group, pure map work after.
    QueryDef("q302_event_motifs",
      (s, d) => events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("sym")).as("__e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          concat_ws("", transform(array_sort(collect_list(col("__e"))),
            e => e("sym"))).as("__trace"))
        .select(col("user_id"), col("n_events"),
          regexp_count(col("__trace"), lit("v+c")).cast("long")
            .as("n_browse_click"),
          regexp_count(col("__trace"), lit("cp")).cast("long")
            .as("n_click_purchase"),
          regexp_count(col("__trace"), lit("v+cp")).cast("long")
            .as("n_full_funnel"),
          regexp_count(col("__trace"), lit("ee")).cast("long")
            .as("n_error_runs"))
        .orderBy("user_id"),
      Some("""WITH o AS (SELECT user_id, ts, event_id,
        |    substr(event_type, 1, 1) AS sym FROM events),
        |tr AS (SELECT user_id, count(*) AS n_events,
        |    string_agg(sym, '' ORDER BY ts, event_id) AS trace
        |  FROM o GROUP BY 1)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(trace, 'v+c')) AS BIGINT)
        |    AS n_browse_click,
        |  CAST(len(regexp_extract_all(trace, 'cp')) AS BIGINT)
        |    AS n_click_purchase,
        |  CAST(len(regexp_extract_all(trace, 'v+cp')) AS BIGINT)
        |    AS n_full_funnel,
        |  CAST(len(regexp_extract_all(trace, 'ee')) AS BIGINT)
        |    AS n_error_runs
        |FROM tr ORDER BY user_id""".stripMargin)))
}
