package graft.queries

import graft.Tables._
import graft.ops.{Relational, Text}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the documents table (SURVEY §2B text
  * rows + the north-star text-analysis operators).
  */
object QueriesText {

  val defs: Seq[QueryDef] = Seq(

    // ---- q30: token statistics per document -------------------------
    QueryDef("q30_token_stats",
      (s, d) => Text.tokenStats(documents(s, d), "text")
        .select("doc_id", "n_tokens", "n_subword_tokens", "avg_token_len")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        |  CAST(len(${DuckSql.toks("text")}) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_subword_tokens,
        |  round(CAST(coalesce(list_sum(list_transform(${DuckSql.toks("text")}, x -> length(x))), 0) AS DOUBLE)
        |    / greatest(len(${DuckSql.toks("text")}), 1), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- q31: corpus term frequencies (top 100) ---------------------
    QueryDef("q31_term_freq",
      (s, d) => Relational.topK(
        Text.termFrequencies(documents(s, d), "text"),
        Seq(col("freq").desc, col("term").asc), 100),
      Some(s"""WITH t AS (SELECT unnest(${DuckSql.toks("text")}) AS term FROM documents)
        |SELECT term, count(*) AS freq FROM t GROUP BY 1
        |ORDER BY freq DESC, term LIMIT 100""".stripMargin)),

    // ---- q32: per-language stats ------------------------------------
    QueryDef("q32_lang_stats",
      (s, d) => documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q33: quality features + composite score --------------------
    QueryDef("q33_quality_score",
      (s, d) => Text.qualityScore(Text.qualityFeatures(documents(s, d), "text"))
        .select("doc_id", "q_n_tokens", "q_punct_ratio", "q_digit_ratio",
          "q_stopword_ratio", "q_uniq_token_ratio", "quality_score")
        .orderBy("doc_id"),
      Some {
        val t = DuckSql.toks("text")
        val en = Text.stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH f AS (SELECT doc_id,
        |  CAST(len($t) AS BIGINT) AS q_n_tokens,
        |  round(CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1), 6) AS q_punct_ratio,
        |  round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |    / greatest(length(text), 1), 6) AS q_digit_ratio,
        |  round(CAST(len(list_filter($t, x -> list_contains($en, x))) AS DOUBLE)
        |    / greatest(len($t), 1), 6) AS q_stopword_ratio,
        |  round(CAST(len(list_distinct($t)) AS DOUBLE)
        |    / greatest(len($t), 1), 6) AS q_uniq_token_ratio
        |FROM documents)
        |SELECT doc_id, q_n_tokens, q_punct_ratio, q_digit_ratio, q_stopword_ratio,
        |  q_uniq_token_ratio,
        |  round(least(CAST(q_n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4 +
        |    q_uniq_token_ratio * 0.4 + least(q_stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin
      }),

    // ---- q34: content fingerprints (exact + min-shingle) ------------
    QueryDef("q34_fingerprints",
      (s, d) => documents(s, d)
        .select(col("doc_id"),
          Text.fingerprint(col("text")).as("fp"),
          Text.minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5(${DuckSql.norm("text")}) AS fp,
        |  list_min(list_transform(${DuckSql.shingles(DuckSql.toks("text"), 3)}, s -> md5(s))) AS min_shingle_fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- q36: TF-IDF (top 100 doc-term scores) ----------------------
    QueryDef("q36_tfidf",
      (s, d) => {
        val docs = documents(s, d)
        val n = docs.count()
        Relational.topK(Text.tfidf(docs, "doc_id", "text", n),
          Seq(col("tfidf").desc, col("doc_id").asc, col("term").asc), 100)
      },
      Some(s"""WITH tr AS (SELECT doc_id, unnest(${DuckSql.toks("text")}) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tr GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tr) GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        |FROM tf JOIN dfq USING (term) CROSS JOIN n
        |ORDER BY tfidf DESC, doc_id, term LIMIT 100""".stripMargin)),

    // ---- q37: rolling-hash fingerprints — oracle recomputes the
    // Karp-Rabin polynomial with Java wrap semantics in HUGEINT -------
    QueryDef("q37_rolling_fingerprint",
      (s, d) => Text.rollingFingerprint(documents(s, d), "doc_id", "text", 3)
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        |  ${DuckSql.rollingFpMin(DuckSql.toks("text"), 3, 1000003L)} AS rolling_fp
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- q94: quality gate with drop-reason accounting ---------------
    QueryDef("q94_quality_gate",
      (s, d) => {
        val t = col("text")
        val nToks = size(Text.tokens(t))
        val punct = length(regexp_replace(t, "[^.!?,;:]", "")).cast("double") /
          greatest(length(t), lit(1))
        Text.qualityGate(documents(s, d), Seq(
            "too_short" -> (nToks >= 25),
            "too_much_punct" -> (punct <= 0.1),
            "non_target_lang" -> col("lang").isin("en", "de", "fr")))
          .groupBy("drop_reason")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("drop_reason")
      },
      Some(s"""WITH g AS (SELECT n_chars,
        |  CASE
        |    WHEN NOT coalesce(len(${DuckSql.toks("text")}) >= 25, false) THEN 'too_short'
        |    WHEN NOT coalesce(CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
        |      / greatest(length(text), 1) <= 0.1, false) THEN 'too_much_punct'
        |    WHEN NOT coalesce(lang IN ('en', 'de', 'fr'), false) THEN 'non_target_lang'
        |  END AS drop_reason
        |  FROM documents)
        |SELECT drop_reason, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM g GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)),

    // ---- q35: language-ID heuristic vs labeled lang -----------------
    // oracle: the argmax-over-(hits, lang) struct mirrors exactly —
    // DuckDB struct comparison is lexicographic by field order, same
    // as Spark's array_max over structs (ties -> max lang string)
    QueryDef("q35_lang_id",
      // repartition before the scoring projection: the interpreted
      // higher-order hit counting is the cost, and a small single-file
      // scan is ONE partition — without the exchange the whole corpus
      // scores on one core (see Dedup.shingleRows)
      (s, d) => documents(s, d)
        .select("doc_id", "lang", "text").repartition(col("doc_id"))
        .withColumn("lang_pred", Text.langIdHeuristic(col("text")))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred"),
      Some {
        val structs = Text.stopwords.toSeq.sortBy(_._1).map { case (lg, words) =>
          val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"struct_pack(hits := len(list_filter(rt, x -> list_contains($list, x))), lg := '$lg')"
        }.mkString(",\n    ")
        s"""WITH t AS (SELECT lang,
        |  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> length(x) > 0) AS rt
        |  FROM documents),
        |s AS (SELECT lang, list_aggregate([
        |    $structs], 'max') AS best FROM t)
        |SELECT lang, CASE WHEN best.hits > 0 THEN best.lg END AS lang_pred,
        |  count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2 NULLS FIRST""".stripMargin
      }),

    // ---- q131: URL parsing (web-corpus provenance columns) ----------
    // URLs built deterministically from row fields, then decomposed
    // with parse_url — the host/path/query-param extraction every
    // crawl-derived corpus needs. The oracle mirrors parse_url with
    // anchored regexes (DuckDB has no URL parser).
    QueryDef("q131_url_parse",
      (s, d) => documents(s, d)
        .where(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id"), lit("?lang="), col("lang")).as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
        |FROM (SELECT doc_id, 'https://' || source || '.example.com/docs/' ||
        |    doc_id || '?lang=' || lang AS url
        |  FROM documents WHERE doc_id < 200) ORDER BY doc_id""".stripMargin)),

    // ---- q132: word-distribution Shannon entropy (quality signal) ---
    // Entropy sums are float-order-sensitive, so the fold is pinned:
    // per-doc term counts collect into a word-sorted list and both
    // engines left-fold it from an explicit 0.0 — identical IEEE op
    // order, deterministic to the bit (same discipline as q70/q127's
    // exact sums; here the order is pinned instead because log2 terms
    // have no exact representation).
    QueryDef("q132_word_entropy",
      (s, d) => {
        val counts = documents(s, d)
          .where(col("doc_id") < 300)
          .select(col("doc_id"), explode(graft.ops.Text.tokens(col("text"))).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val agg = counts.groupBy("doc_id").agg(
          sum(col("c")).as("n_tokens"),
          sort_array(collect_list(struct(col("w"), col("c").cast("double").as("c"))))
            .as("wc"))
        val total = col("n_tokens").cast("double")
        val probs = transform(col("wc"), s => s.getField("c") / total)
        agg.select(col("doc_id"),
            col("n_tokens").cast("bigint").as("n_tokens"),
            size(col("wc")).cast("bigint").as("n_unique"),
            round(-aggregate(probs, lit(0.0), (acc, p) => acc + p * log2(p)), 6)
              .as("entropy"))
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS c
        |  FROM (SELECT doc_id, unnest(${DuckSql.toks("text")}) AS w
        |    FROM documents WHERE doc_id < 300) GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_unique,
        |    list(c ORDER BY w) AS cs, CAST(sum(c) AS DOUBLE) AS total
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_unique,
        |  round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(cs, x -> (x/total) * log2(x/total))),
        |    (acc, x) -> acc + x), 6) + 0 AS entropy
        |FROM a ORDER BY doc_id""".stripMargin)),

    // ---- q142: Count-Min heavy hitters (hash-verified sketch) -------
    // The CMS is d=3 x w=256 md5-hashed counters — a FIXED-size table
    // regardless of corpus size (the 100 TB frequency-estimation shape
    // where a full term groupBy is unbounded) — and, like the KMV/SRP
    // sketches, its md5 derivation lets the oracle recompute every
    // counter and the min-estimate exactly. est >= cnt always (CMS
    // upper bound, spec-asserted); the exact count rides along for
    // calibration.
    QueryDef("q142_cms_heavy_hitters",
      (s, d) => graft.ops.Text.cmsHeavyHitters(
          documents(s, d), "text", d = 3, w = 256, minCount = 20L)
        .orderBy("term"),
      Some {
        val h = (j: Int) => s"(${DuckSql.hashLong(s"term || '#$j'")} % 256)"
        s"""WITH terms AS (SELECT unnest(${DuckSql.toks("text")}) AS term
        |  FROM documents),
        |js AS (SELECT unnest(generate_series(0, 2)) AS j),
        |occ AS (SELECT term, j,
        |    CASE j WHEN 0 THEN ${h(0)} WHEN 1 THEN ${h(1)}
        |      ELSE ${h(2)} END AS bucket
        |  FROM terms, js),
        |sk AS (SELECT j, bucket, count(*) AS cnt FROM occ GROUP BY 1, 2),
        |ex AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
        |db AS (SELECT term, j,
        |    CASE j WHEN 0 THEN ${h(0)} WHEN 1 THEN ${h(1)}
        |      ELSE ${h(2)} END AS bucket
        |  FROM ex, js),
        |est AS (SELECT db.term, min(sk.cnt) AS est
        |  FROM db JOIN sk USING (j, bucket) GROUP BY 1)
        |SELECT e.term, e.est, ex.cnt FROM est e JOIN ex USING (term)
        |WHERE e.est >= 20 ORDER BY term""".stripMargin
      })
  )
}
