package graft.queries

import graft.ops.{Relational, Sampling, Text}
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-6 fourth batch: retrieval-style ranking (BM25) and held-out
  * language-model scoring with backoff — the two classic text-quality
  * signals the engine's TF-IDF (q36) and corpus-trained bigram NLL
  * (q153) did not yet cover. Both use the order-pinned fold discipline
  * (q132) so their transcendental sums hash-verify in DuckDB.
  */
object QueriesRound6d {

  val defs: Seq[QueryDef] = Seq(

    // ---- q206: BM25 retrieval scoring --------------------------------
    // Okapi BM25 (k1=1.2, b=0.75, Lucene-style ln(1+...) IDF that stays
    // positive for common terms) of every document against a fixed
    // 4-term query. The corpus statistics are two cheap frames: per-doc
    // length is a map-side size(tokens) (no shuffle), document
    // frequency is one hash-agg over the MATCHED term rows only (the
    // token stream is filtered to the query terms before any shuffle,
    // so the exchange carries |terms| rows, not the corpus token
    // stream). N and avgdl ride as one broadcast scalar row; per-doc
    // scores are a tok-sorted fold (q132 discipline) so the ln/division
    // sum replays bit-identically; top-50 by rounded score via
    // TakeOrderedAndProject.
    QueryDef("q206_bm25",
      (s, d) => {
        val qTerms = Seq("spark", "query", "join", "window")
        val t = documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dls = t.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
        val scal = dls.agg(count(lit(1)).as("__n"), sum("dl").as("__sumdl"))
          .select(col("__n"),
            (col("__sumdl").cast("double") / col("__n").cast("double"))
              .as("__avgdl"))
        val tf = t.select(col("doc_id"), explode(col("tk")).as("tok"))
          .where(col("tok").isin(qTerms: _*))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val terms = tf.join(broadcast(dfreq), "tok")
          .join(dls, "doc_id")
          .crossJoin(broadcast(scal))
          .select(col("doc_id"),
            struct(col("tok"),
              (log(lit(1.0) +
                  (col("__n").cast("double") - col("df").cast("double") + 0.5) /
                  (col("df").cast("double") + 0.5)) *
                (col("tf").cast("double") * 2.2) /
                (col("tf").cast("double") +
                  lit(1.2) * (lit(0.25) +
                    lit(0.75) * col("dl").cast("double") / col("__avgdl"))))
                .as("w")).as("tw"))
        terms.groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"),
            sort_array(collect_list(col("tw"))).as("ws"))
          .select(col("doc_id"), col("n_hits"),
            round(aggregate(col("ws"), lit(0.0),
              (acc, t0) => acc + t0.getField("w")), 6).as("bm25"))
          .transform(df0 => Relational.topK(df0,
            Seq(col("bm25").desc, col("doc_id").asc), 50))
          .orderBy(col("bm25").desc, col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS tk
        |    FROM documents),
        |dls AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM t),
        |sc AS (SELECT count(*) AS n,
        |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dls),
        |tf AS (SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t)
        |  WHERE list_contains(['spark', 'query', 'join', 'window'], tok)
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |tw AS (SELECT tf.doc_id, tf.tok,
        |    ln(1.0 + (CAST(sc.n AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) /
        |        (CAST(dfreq.df AS DOUBLE) + 0.5)) *
        |      (CAST(tf.tf AS DOUBLE) * 2.2) /
        |      (CAST(tf.tf AS DOUBLE) +
        |        1.2 * (0.25 + 0.75 * CAST(dls.dl AS DOUBLE) / sc.avgdl)) AS w
        |  FROM tf JOIN dfreq USING (tok) JOIN dls USING (doc_id), sc),
        |a AS (SELECT doc_id, count(*) AS n_hits,
        |    list(w ORDER BY tok) AS ws FROM tw GROUP BY 1)
        |SELECT doc_id, n_hits,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ws),
        |    (acc, x) -> acc + x), 6) + 0 AS bm25
        |FROM a ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin)),

    // ---- q207: Stupid-Backoff held-out LM scoring --------------------
    // Perplexity-style quality filtering done the way it's actually
    // deployed: the bigram model trains on the TRAIN split (md5 hash
    // split, q81 convention) and scores the HELD-OUT split, so unseen
    // bigrams genuinely occur and the backoff branch is exercised —
    // q153's corpus-trained score can never hit an unseen bigram.
    // Stupid Backoff (Brants et al. 2007): s(w2|w1) = c(w1w2)/c(w1) if
    // the bigram was seen, else 0.4 * unigram probability — here the
    // unigram backoff is Laplace-floored ((c(w2)+1)/(Nt+V)) so a w2
    // absent from train still scores finite. Count frames are map-side-
    // combinable hash-aggs over the train stream; eval bigrams join the
    // model on the bigram/token keys (never doc x doc); Nt and V ride
    // as one broadcast scalar row. Per-doc mean -log2 via the bg-sorted
    // fold (q132 discipline).
    QueryDef("q207_backoff_lm",
      (s, d) => {
        val d0 = documents(s, d).select(col("doc_id"),
          (Sampling.hashLong(col("doc_id")) % 100).as("hm"),
          Text.tokens(col("text")).as("tk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def bgs(df0: DataFrame): DataFrame = df0.select(col("doc_id"),
          explode(zip_with(
            slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
            slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
            (a, b) => concat(a, lit("#"), b))).as("bg"))
        val cw = d0.where(col("hm") < 80)
          .select(explode(col("tk")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cw"))
        val scal = cw.agg(sum("cw").as("__nt"), count(lit(1)).as("__v"))
        val cbg = bgs(d0.where(col("hm") < 80))
          .groupBy("bg").agg(count(lit(1)).as("cbg"))
        val p = when(col("cbg").isNotNull,
            col("cbg").cast("double") / col("cw1").cast("double"))
          .otherwise(lit(0.4) *
            (coalesce(col("cw2"), lit(0L)).cast("double") + 1.0) /
            (col("__nt").cast("double") + col("__v").cast("double")))
        bgs(d0.where(col("hm") >= 80))
          .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
          .withColumn("w1", split(col("bg"), "#").getItem(0))
          .withColumn("w2", split(col("bg"), "#").getItem(1))
          .join(cbg, Seq("bg"), "left")
          .join(cw.select(col("tok").as("w1"), col("cw").as("cw1")),
            Seq("w1"), "left")
          .join(cw.select(col("tok").as("w2"), col("cw").as("cw2")),
            Seq("w2"), "left")
          .crossJoin(broadcast(scal))
          .select(col("doc_id"), col("bg"), col("c"), p.as("p"))
          .groupBy("doc_id")
          .agg(sum("c").cast("bigint").as("n_bigrams"),
            sort_array(collect_list(struct(col("bg"),
              col("c").cast("double").as("c"), col("p")))).as("terms"))
          .select(col("doc_id"), col("n_bigrams"),
            round(-aggregate(col("terms"), lit(0.0),
                (acc, t) => acc + t.getField("c") * log2(t.getField("p")))
              / col("n_bigrams"), 6).as("backoff_nll"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d0 AS (SELECT doc_id,
        |    ${DuckSql.hashLong("doc_id")} % 100 AS hm,
        |    ${DuckSql.toks("text")} AS tk FROM documents),
        |cw AS (SELECT tok, count(*) AS cw
        |  FROM (SELECT unnest(tk) AS tok FROM d0 WHERE hm < 80) GROUP BY 1),
        |sc AS (SELECT CAST(sum(cw) AS DOUBLE) AS nt,
        |    CAST(count(*) AS DOUBLE) AS v FROM cw),
        |cbg AS (SELECT bg, count(*) AS cbg
        |  FROM (SELECT unnest(list_transform(
        |      generate_series(1, greatest(len(tk) - 1, 0)),
        |      i -> tk[i] || '#' || tk[i+1])) AS bg FROM d0 WHERE hm < 80)
        |  GROUP BY 1),
        |ec AS (SELECT doc_id, bg, count(*) AS c
        |  FROM (SELECT doc_id, unnest(list_transform(
        |      generate_series(1, greatest(len(tk) - 1, 0)),
        |      i -> tk[i] || '#' || tk[i+1])) AS bg FROM d0 WHERE hm >= 80)
        |  GROUP BY 1, 2),
        |j AS (SELECT ec.doc_id, ec.bg, CAST(ec.c AS DOUBLE) AS c,
        |    CASE WHEN cbg.cbg IS NOT NULL
        |      THEN CAST(cbg.cbg AS DOUBLE) / CAST(c1.cw AS DOUBLE)
        |      ELSE 0.4 * (CAST(coalesce(c2.cw, 0) AS DOUBLE) + 1.0) /
        |        (sc.nt + sc.v) END AS p
        |  FROM ec LEFT JOIN cbg USING (bg)
        |    LEFT JOIN cw c1 ON c1.tok = string_split(ec.bg, '#')[1]
        |    LEFT JOIN cw c2 ON c2.tok = string_split(ec.bg, '#')[2], sc),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    list(c * log2(p) ORDER BY bg) AS terms FROM j GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |  round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), terms),
        |    (acc, x) -> acc + x) / n_bigrams, 6) + 0 AS backoff_nll
        |FROM a ORDER BY doc_id""".stripMargin)),

    // ---- q208: exact two-sample Kolmogorov-Smirnov drift test --------
    // The distribution-drift gate q191's total-variation distance can't
    // provide: KS compares the full CDFs (sensitive to shifts TVD on
    // coarse types misses) between the two md5-split halves of the
    // corpus, over the doc-length-in-tokens statistic. Everything is
    // INTEGER-EXACT (q191's cross-multiplication discipline applied to
    // the max deviation): per-length counts for both halves come from
    // ONE hash-agg over the corpus (conditional sums, one shuffle on
    // the O(distinct lengths) domain), the CDFs are cumulative windows
    // over that domain-bounded frame, and D rides as
    // max(|cum_a*n_b - cum_b*n_a|) * 1e6 div (n_a*n_b) — engine-
    // identical floor arithmetic, no float CDFs. Output is one row:
    // split sizes, KS distance in micro-units, and the smallest length
    // where the max deviation is attained.
    QueryDef("q208_ks_drift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = documents(s, d)
          .select((Sampling.hashLong(col("doc_id")) % 100).as("hm"),
            size(Text.tokens(col("text"))).cast("long").as("len"))
          .groupBy("len")
          .agg(sum(when(col("hm") < 50, 1L).otherwise(0L)).as("ca"),
            sum(when(col("hm") >= 50, 1L).otherwise(0L)).as("cb"))
        val w = Window.orderBy("len")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cums = counts
          .select(col("len"), sum("ca").over(w).as("cuma"),
            sum("cb").over(w).as("cumb"))
        val scal = counts.agg(sum("ca").as("__na"), sum("cb").as("__nb"))
        val dev = cums.crossJoin(broadcast(scal))
          .select(col("len"), col("__na"), col("__nb"),
            abs(col("cuma") * col("__nb") - col("cumb") * col("__na"))
              .as("dev"))
        val mx = dev.agg(max("dev").as("__maxdev"))
        dev.crossJoin(broadcast(mx))
          .where(col("dev") === col("__maxdev"))
          .groupBy("__na", "__nb", "__maxdev")
          .agg(min("len").as("at_len"))
          .select(col("__na").as("n_a"), col("__nb").as("n_b"),
            expr("__maxdev * 1000000L div (__na * __nb)").as("ks_micro"),
            col("at_len"))
      },
      Some(s"""WITH h AS (SELECT ${DuckSql.hashLong("doc_id")} % 100 AS hm,
        |    CAST(len(${DuckSql.toks("text")}) AS BIGINT) AS len
        |  FROM documents),
        |c AS (SELECT len,
        |    sum(CASE WHEN hm < 50 THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN hm >= 50 THEN 1 ELSE 0 END) AS cb
        |  FROM h GROUP BY 1),
        |cu AS (SELECT len,
        |    sum(ca) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cuma,
        |    sum(cb) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cumb FROM c),
        |sc AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
        |dev AS (SELECT len, na, nb,
        |    abs(cuma * nb - cumb * na) AS dev FROM cu, sc)
        |SELECT CAST(any_value(na) AS BIGINT) AS n_a,
        |  CAST(any_value(nb) AS BIGINT) AS n_b,
        |  CAST(max(dev) * 1000000 // (any_value(na) * any_value(nb))
        |    AS BIGINT) AS ks_micro,
        |  min(CASE WHEN dev = (SELECT max(dev) FROM dev) THEN len END)
        |    AS at_len
        |FROM dev""".stripMargin)),

    // ---- q209: PMI collocations --------------------------------------
    // Pointwise mutual information over adjacent token pairs — the
    // classic collocation detector ("which bigrams occur far more than
    // chance"), the signal behind phrase-vocabulary induction (the
    // statistical cousin of q108's raw BPE pair counts). All counts are
    // exact integers from two map-side-combinable hash-aggs; PMI =
    // log2((cbg·N) / (cw1·cw2)) computed as ONE log2 of a ratio of
    // exact long products (each < 2^53, so the doubles are exact and
    // the transcendental is engine-identical — no fold needed, one
    // log per row). Min support 5 kills the noise floor; top-50 by
    // rounded PMI with bigram tie-break via TakeOrderedAndProject.
    QueryDef("q209_pmi_collocations",
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        val bgs = t.select(explode(zip_with(
            slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
            slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
            (a, b) => concat(a, lit("#"), b))).as("bg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cbg = bgs.groupBy("bg").agg(count(lit(1)).as("cbg"))
        val scal = cbg.agg(sum("cbg").as("__n"))
        val cw = bgs
          .select(split(col("bg"), "#").getItem(0).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cwl"))
        val cw2 = bgs
          .select(split(col("bg"), "#").getItem(1).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cwr"))
        cbg.where(col("cbg") >= 5)
          .withColumn("w1", split(col("bg"), "#").getItem(0))
          .withColumn("w2", split(col("bg"), "#").getItem(1))
          .join(cw.select(col("tok").as("w1"), col("cwl")), "w1")
          .join(cw2.select(col("tok").as("w2"), col("cwr")), "w2")
          .crossJoin(broadcast(scal))
          .select(col("w1"), col("w2"), col("cbg"),
            round(log2((col("cbg") * col("__n")).cast("double") /
              (col("cwl") * col("cwr")).cast("double")), 6).as("pmi"))
          .transform(df0 => Relational.topK(df0,
            Seq(col("pmi").desc, col("w1").asc, col("w2").asc), 50))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
      },
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS tk
        |    FROM documents),
        |b AS (SELECT unnest(list_transform(
        |    generate_series(1, greatest(len(tk) - 1, 0)),
        |    i -> tk[i] || '#' || tk[i+1])) AS bg FROM t),
        |cbg AS (SELECT bg, count(*) AS cbg FROM b GROUP BY 1),
        |sc AS (SELECT CAST(sum(cbg) AS BIGINT) AS n FROM cbg),
        |cwl AS (SELECT string_split(bg, '#')[1] AS tok, count(*) AS cwl
        |  FROM b GROUP BY 1),
        |cwr AS (SELECT string_split(bg, '#')[2] AS tok, count(*) AS cwr
        |  FROM b GROUP BY 1)
        |SELECT string_split(cbg.bg, '#')[1] AS w1,
        |  string_split(cbg.bg, '#')[2] AS w2, cbg.cbg,
        |  round(log2(CAST(cbg.cbg * sc.n AS DOUBLE) /
        |    CAST(cwl.cwl * cwr.cwr AS DOUBLE)), 6) + 0 AS pmi
        |FROM cbg, sc
        |  JOIN cwl ON cwl.tok = string_split(cbg.bg, '#')[1]
        |  JOIN cwr ON cwr.tok = string_split(cbg.bg, '#')[2]
        |WHERE cbg.cbg >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin)))
}
