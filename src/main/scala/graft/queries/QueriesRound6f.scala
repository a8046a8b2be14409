package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Eval, Graph, Multimodal, Sampling}
import org.apache.spark.sql.functions._

/** Round-6 sixth batch: exact classifier evaluation (ROC AUC via the
  * rank-sum identity), perceptual image hashing over real BMP bytes,
  * and per-document n-gram novelty scoring. The arithmetic that
  * reaches the hash check is integer end-to-end.
  */
object QueriesRound6f {

  val defs: Seq[QueryDef] = Seq(

    // ---- q217: exact ROC AUC of a quality classifier -----------------
    // The eval half of the q201 model-based-filtering lane: given
    // per-document scores (n_chars stands in for the probe's logit)
    // and deterministic labels correlated with the score (positive iff
    // md5-noise % 600 < n_chars — AUC lands meaningfully above ½ and
    // both classes are non-empty at every SF), compute exact AUC by
    // Mann–Whitney: one map-side-combining agg to per-distinct-score
    // class counts, a cumulative window over that O(distinct scores)
    // frame, U2 = Σ n_pos·(2·cumneg_below + n_neg), one integer
    // division. No ranks over the corpus, no floats anywhere.
    QueryDef("q217_auc_exact",
      (s, d) => {
        val h = Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit("#lbl")))
        val labeled = documents(s, d).select(
          col("n_chars").as("score"),
          (h % 600 < col("n_chars")).as("is_pos"))
        Eval.aucPpm(labeled, "score", "is_pos")
      },
      Some(s"""WITH lab AS (SELECT n_chars AS score,
        |    ${DuckSql.hashLong("doc_id || '#lbl'")} % 600 < n_chars AS is_pos
        |  FROM documents),
        |sc AS (SELECT score,
        |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS n_neg
        |  FROM lab GROUP BY 1),
        |c AS (SELECT score, n_pos, n_neg,
        |    coalesce(sum(n_neg) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM sc)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CAST(sum(n_pos * (2 * cumneg + n_neg)) AS BIGINT) AS u2,
        |  CAST(sum(n_pos * (2 * cumneg + n_neg)) * 1000000
        |    // (sum(n_pos) * sum(n_neg) * 2) AS BIGINT) AS auc_ppm
        |FROM c""".stripMargin)),

    // ---- q218: image average-hash + exact-dup grouping ---------------
    // Image dedup without a codec: synthesize a deterministic 16×16
    // 24-bpp BMP per part (pixel i = ((key%17)·37 + i²·13) % 256, so
    // keys sharing key%17 render IDENTICAL images — the dup classes),
    // run the REAL byte walk (BITMAPFILEHEADER offsets, bottom-up row
    // flip, stride padding — Multimodal.averageHash), block-average to
    // the 8×8 aHash grid with the division-free integer threshold
    // (bit ⟺ 64·blocksum ≥ total), and group exact duplicates by the
    // 64-bit hash (as two 32-bit halves, signed-safe in any engine).
    // The oracle replays the pixel formula and the bit algebra;
    // byte-walk bugs (stride, flip, offset) cannot hash-match.
    QueryDef("q218_image_ahash",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val v = (key % 17).toInt
          val px = Array.tabulate(256)(i => (v * 37 + i * i * 13) % 256)
          Multimodal.makeBmp(16, 16, px)
        }
        val hashed = part(s, d).where(col("p_partkey") <= 120)
          .select(col("p_partkey"),
            Multimodal.imageAHash(mk(col("p_partkey"))).as("h"))
          .select(col("p_partkey"),
            col("h.hash_hi").as("hash_hi"), col("h.hash_lo").as("hash_lo"),
            col("h.n_set").as("n_set"), col("h.valid").as("valid"))
        val groups = hashed.groupBy("hash_hi", "hash_lo")
          .agg(count(lit(1)).as("group_size"))
        hashed.join(broadcast(groups), Seq("hash_hi", "hash_lo"))
          .orderBy("p_partkey")
      },
      Some("""WITH k AS (SELECT p_partkey, p_partkey % 17 AS v
        |  FROM part WHERE p_partkey <= 120),
        |px AS (SELECT p_partkey, list_transform(generate_series(0, 255),
        |    i -> (v * 37 + i * i * 13) % 256) AS ps FROM k),
        |bs AS (SELECT p_partkey, CAST(list_sum(ps) AS BIGINT) AS total,
        |    list_transform(generate_series(0, 63), b ->
        |      ps[((b // 8) * 2) * 16 + (b % 8) * 2 + 1]
        |      + ps[((b // 8) * 2) * 16 + (b % 8) * 2 + 2]
        |      + ps[((b // 8) * 2 + 1) * 16 + (b % 8) * 2 + 1]
        |      + ps[((b // 8) * 2 + 1) * 16 + (b % 8) * 2 + 2]) AS blocks
        |  FROM px),
        |bits AS (SELECT p_partkey, list_transform(generate_series(1, 64),
        |    p -> CASE WHEN 64 * blocks[p] >= total THEN 1 ELSE 0 END) AS bit
        |  FROM bs),
        |h AS (SELECT p_partkey,
        |    CAST(list_sum(list_transform(generate_series(33, 64),
        |      p -> bit[p] * (CAST(1 AS BIGINT) << (p - 33)))) AS BIGINT) AS hash_hi,
        |    CAST(list_sum(list_transform(generate_series(1, 32),
        |      p -> bit[p] * (CAST(1 AS BIGINT) << (p - 1)))) AS BIGINT) AS hash_lo,
        |    CAST(list_sum(bit) AS BIGINT) AS n_set
        |  FROM bits)
        |SELECT h.p_partkey, h.hash_hi, h.hash_lo, h.n_set, true AS valid,
        |  g.group_size
        |FROM h JOIN (SELECT hash_hi, hash_lo,
        |    CAST(count(*) AS BIGINT) AS group_size
        |  FROM h GROUP BY 1, 2) g USING (hash_hi, hash_lo)
        |ORDER BY p_partkey""".stripMargin)),

    // ---- q219: per-document n-gram novelty -----------------------------
    // Marginal-contribution scoring (the data-valuation signal): what
    // fraction of each doc's distinct 8-token windows does NO
    // earlier-id document contain? One shuffle keyed on the window
    // fingerprint finds the global first owner (partial-combining
    // min); ownership folds back per doc map-side. Docs shorter than
    // 8 tokens report 0 windows, ppm null.
    QueryDef("q219_window_novelty",
      (s, d) => Dedup.windowNovelty(documents(s, d), "doc_id", "text", 8)
        .orderBy("doc_id"),
      Some(s"""WITH tt AS (SELECT doc_id, ${DuckSql.toks("text")} AS tks
        |  FROM documents),
        |tk AS (SELECT DISTINCT doc_id,
        |    unnest(list_distinct(${DuckSql.shingles("tks", 8)})) AS t
        |  FROM tt),
        |fo AS (SELECT t, min(doc_id) AS first_id FROM tk GROUP BY 1),
        |pd AS (SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |    CAST(sum(CASE WHEN fo.first_id = tk.doc_id THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM tk JOIN fo ON fo.t = tk.t GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(pd.n_windows, 0) AS n_windows,
        |  coalesce(pd.n_novel, 0) AS n_novel,
        |  CASE WHEN pd.n_windows > 0
        |    THEN (pd.n_novel * 1000000) // pd.n_windows END AS novelty_ppm
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN pd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // ---- q220: image NEAR-dup pairs via banded aHash -----------------
    // The scale path q218 documents: each part's image is its class
    // pattern (key%17) with ONE pixel perturbed (+64 at position
    // key%256), so same-class keys render almost-identical images and
    // their aHashes differ in a few bits. Pairs with Hamming <= 6 are
    // found by 8-bit band blocking over the 64-bit hash — EXACT by
    // pigeonhole (6 < 8 bands), so the brute-force all-pairs oracle
    // must agree; the engine never materializes all pairs.
    QueryDef("q220_image_neardup",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val v = (key % 17).toInt; val p = (key % 256).toInt
          val px = Array.tabulate(256) { i =>
            (v * 37 + i * i * 13 + (if (i == p) 64 else 0)) % 256
          }
          Multimodal.makeBmp(16, 16, px)
        }
        val hashed = part(s, d).where(col("p_partkey") <= 120)
          .select(col("p_partkey").as("id"),
            Multimodal.imageAHash(mk(col("p_partkey"))).as("h"))
          .select(col("id"), col("h.hash_hi").as("hash_hi"),
            col("h.hash_lo").as("hash_lo"))
        Dedup.hammingNearDupPairs64(hashed, "id", "hash_hi", "hash_lo",
            maxHamming = 6)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH k AS (SELECT p_partkey, p_partkey % 17 AS v,
        |    p_partkey % 256 AS p FROM part WHERE p_partkey <= 120),
        |px AS (SELECT p_partkey, list_transform(generate_series(0, 255),
        |    i -> (v * 37 + i * i * 13
        |          + CASE WHEN i = p THEN 64 ELSE 0 END) % 256) AS ps
        |  FROM k),
        |bs AS (SELECT p_partkey, CAST(list_sum(ps) AS BIGINT) AS total,
        |    list_transform(generate_series(0, 63), b ->
        |      ps[((b // 8) * 2) * 16 + (b % 8) * 2 + 1]
        |      + ps[((b // 8) * 2) * 16 + (b % 8) * 2 + 2]
        |      + ps[((b // 8) * 2 + 1) * 16 + (b % 8) * 2 + 1]
        |      + ps[((b // 8) * 2 + 1) * 16 + (b % 8) * 2 + 2]) AS blocks
        |  FROM px),
        |bits AS (SELECT p_partkey, list_transform(generate_series(1, 64),
        |    p -> CASE WHEN 64 * blocks[p] >= total THEN 1 ELSE 0 END) AS bit
        |  FROM bs),
        |h AS (SELECT p_partkey,
        |    CAST(list_sum(list_transform(generate_series(33, 64),
        |      p -> bit[p] * (CAST(1 AS BIGINT) << (p - 33)))) AS BIGINT) AS hi,
        |    CAST(list_sum(list_transform(generate_series(1, 32),
        |      p -> bit[p] * (CAST(1 AS BIGINT) << (p - 1)))) AS BIGINT) AS lo
        |  FROM bits)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |    AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.p_partkey < b.p_partkey
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
        |ORDER BY 1, 2""".stripMargin)),

    // ---- q221: per-domain rank normalization -------------------------
    // Quality scores are only comparable WITHIN a domain (each
    // language's length distribution differs); rank-normalizing to
    // [0, 1e6] makes one global keep/drop threshold meaningful. Pure
    // integer percent-rank: rank() over the lang-partitioned window
    // (ties share a rank — no arbitrary order), pr_ppm =
    // (rank-1)·10⁶ div (n-1). Partitioned window only — no global
    // sort; the q199 two-level trick is the documented path if a
    // single domain outgrows one executor's sort.
    QueryDef("q221_rank_normalize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang").orderBy("n_chars")
        val n = Window.partitionBy("lang")
        documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"),
            rank().over(w).cast("long").as("rnk"),
            count(lit(1)).over(n).as("n"))
          .withColumn("pr_ppm",
            when(col("n") > 1, expr("((rnk - 1) * 1000000L) div (n - 1)"))
              .otherwise(lit(0L)))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars,
        |  CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT)
        |    AS rnk,
        |  CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n,
        |  CASE WHEN count(*) OVER (PARTITION BY lang) > 1
        |    THEN (CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars)
        |      AS BIGINT) - 1) * 1000000
        |      // (count(*) OVER (PARTITION BY lang) - 1)
        |    ELSE 0 END AS pr_ppm
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- q222: calibration bins for the q217 label model -------------
    // Reliability diagram in exact integers: the generative
    // P(pos) = n_chars/600 (that IS q217's label rule) quantized to
    // ppm, bucketed into deciles; per bucket the mean predicted ppm
    // vs the observed positive share ppm, and their gap. A calibrated
    // model shows gap ≈ 0; one map-side-combining agg over the corpus.
    QueryDef("q222_calibration_bins",
      (s, d) => {
        val h = Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit("#lbl")))
        documents(s, d).select(
            expr("(least(n_chars, 600) * 1000000L) div 600").as("pred_ppm"),
            (h % 600 < col("n_chars")).cast("long").as("is_pos"))
          .withColumn("bucket", expr("pred_ppm div 100000"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("is_pos").as("n_pos"),
            sum("pred_ppm").as("sum_pred"))
          .select(col("bucket"), col("n"), col("n_pos"),
            expr("sum_pred div n").as("mean_pred_ppm"),
            expr("(n_pos * 1000000L) div n").as("obs_ppm"),
            abs(expr("sum_pred div n") - expr("(n_pos * 1000000L) div n"))
              .as("gap_ppm"))
          .orderBy("bucket")
      },
      Some(s"""WITH lab AS (SELECT
        |    (least(n_chars, 600) * 1000000) // 600 AS pred_ppm,
        |    CASE WHEN ${DuckSql.hashLong("doc_id || '#lbl'")} % 600 < n_chars
        |      THEN 1 ELSE 0 END AS is_pos
        |  FROM documents)
        |SELECT pred_ppm // 100000 AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(is_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(pred_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
        |  CAST(sum(is_pos) * 1000000 // count(*) AS BIGINT) AS obs_ppm,
        |  CAST(abs(sum(pred_ppm) // count(*)
        |    - sum(is_pos) * 1000000 // count(*)) AS BIGINT) AS gap_ppm
        |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q223: BPE merge training, two corpus-level rounds -----------
    // Tokenizer TRAINING as a distributed operator (q108 counts pairs;
    // this one executes the merge loop): per round, count adjacent
    // pairs with x ≠ y (map-side-combining hash-agg), pick the global
    // argmax (count desc, then (x, y) — engine-portable for ASCII
    // tokens), rewrite every document via the position-indexed merge
    // (no fold, no UDF — x ≠ y makes merge sites non-overlapping, so
    // "all sites" IS greedy BPE), repeat on the rewritten corpus. The
    // winner rides a broadcast 1-row frame — rounds chain with no
    // driver collect. Repartition barriers pin the token arrays so
    // CollapseProject can't inline the tokenizer (or a whole round's
    // rewrite) into the next round's multi-reference lambda. Output:
    // each round's merge, its count at selection, corpus tokens after.
    QueryDef("q223_bpe_train",
      (s, d) => {
        import graft.ops.Text
        val toks0 = documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .repartition(col("doc_id"))
        val (m1raw, b1) = Text.bpeMergeRound(toks0, "toks")
        val m1 = m1raw.repartition(col("doc_id"))
        val (m2, b2) = Text.bpeMergeRound(m1, "toks")
        def tot(m: org.apache.spark.sql.DataFrame) =
          m.agg(sum(size(col("toks"))).as("tokens_after"))
        val r1 = b1.crossJoin(broadcast(tot(m1)))
          .select(lit(1L).as("round"), col("x"), col("y"), col("cnt"),
            col("tokens_after"))
        val r2 = b2.crossJoin(broadcast(tot(m2)))
          .select(lit(2L).as("round"), col("x"), col("y"), col("cnt"),
            col("tokens_after"))
        r1.unionAll(r2).orderBy("round")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, ${DuckSql.toks("text")} AS t
        |    FROM documents),
        |g1 AS (SELECT unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 1, 0)),
        |    i -> t[i] || '#' || t[i+1])) AS bg FROM t0),
        |c1 AS (SELECT string_split(bg, '#')[1] AS x,
        |    string_split(bg, '#')[2] AS y, count(*) AS cnt FROM g1
        |  WHERE string_split(bg, '#')[1] <> string_split(bg, '#')[2]
        |  GROUP BY 1, 2),
        |b1 AS (SELECT x, y, CAST(cnt AS BIGINT) AS cnt FROM c1
        |  ORDER BY cnt DESC, x, y LIMIT 1),
        |t1 AS (SELECT doc_id, list_filter(list_transform(
        |    generate_series(1, len(t)), i ->
        |      CASE WHEN t[i] = b.x AND i < len(t) AND t[i+1] = b.y
        |             THEN b.x || '_' || b.y
        |           WHEN i > 1 AND t[i-1] = b.x AND t[i] = b.y THEN NULL
        |           ELSE t[i] END), z -> z IS NOT NULL) AS t
        |  FROM t0, b1 b),
        |g2 AS (SELECT unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 1, 0)),
        |    i -> t[i] || '#' || t[i+1])) AS bg FROM t1),
        |c2 AS (SELECT string_split(bg, '#')[1] AS x,
        |    string_split(bg, '#')[2] AS y, count(*) AS cnt FROM g2
        |  WHERE string_split(bg, '#')[1] <> string_split(bg, '#')[2]
        |  GROUP BY 1, 2),
        |b2 AS (SELECT x, y, CAST(cnt AS BIGINT) AS cnt FROM c2
        |  ORDER BY cnt DESC, x, y LIMIT 1),
        |t2 AS (SELECT doc_id, list_filter(list_transform(
        |    generate_series(1, len(t)), i ->
        |      CASE WHEN t[i] = b.x AND i < len(t) AND t[i+1] = b.y
        |             THEN b.x || '_' || b.y
        |           WHEN i > 1 AND t[i-1] = b.x AND t[i] = b.y THEN NULL
        |           ELSE t[i] END), z -> z IS NOT NULL) AS t
        |  FROM t1, b2 b)
        |SELECT 1 AS round, b1.x, b1.y, b1.cnt,
        |  (SELECT CAST(sum(len(t)) AS BIGINT) FROM t1) AS tokens_after
        |FROM b1
        |UNION ALL
        |SELECT 2 AS round, b2.x, b2.y, b2.cnt,
        |  (SELECT CAST(sum(len(t)) AS BIGINT) FROM t2) AS tokens_after
        |FROM b2
        |ORDER BY round""".stripMargin)),

    // ---- q224: prefix-duplicate pairs (truncated re-crawls) ----------
    // The dup family Jaccard scores LOW: a cut-off mirror of a long
    // page shares few shingles with it, yet is pure duplication. The
    // corpus is augmented with deterministic truncated twins (docs
    // with doc_id % 50 == 0 and >= 16 tokens reappear as their first
    // half under id + 1e6 — both engines plant identical twins), then
    // every (proper-prefix, superset) pair is found by equi-joining on
    // the first-8-token fingerprint (complete: a prefix pair agrees
    // there) and verified by slice equality — never all-pairs.
    QueryDef("q224_prefix_dups",
      (s, d) => {
        import graft.ops.Text
        val toks = documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
          .repartition(col("doc_id"))
        val trunc = toks
          .where(col("doc_id") % 50 === 0 && size(col("toks")) >= 16)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            expr("slice(toks, 1, size(toks) div 2)").as("toks"))
        Dedup.prefixDupPairs(toks.unionByName(trunc), "doc_id", "toks")
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH t0 AS (SELECT doc_id, ${DuckSql.toks("text")} AS tks
        |    FROM documents),
        |tr AS (SELECT doc_id + 1000000 AS doc_id,
        |    tks[1:(len(tks) // 2)] AS tks
        |  FROM t0 WHERE doc_id % 50 = 0 AND len(tks) >= 16),
        |u AS (SELECT * FROM t0 UNION ALL SELECT * FROM tr),
        |t AS (SELECT doc_id, tks, CAST(len(tks) AS BIGINT) AS n FROM u
        |  WHERE len(tks) >= 8)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  a.n AS len_a, b.n AS len_b
        |FROM t a JOIN t b
        |  ON array_to_string(a.tks[1:8], ' ') = array_to_string(b.tks[1:8], ' ')
        |  AND a.n < b.n
        |WHERE b.tks[1:CAST(a.n AS INTEGER)] = a.tks
        |ORDER BY 1, 2""".stripMargin)),

    // ---- q225: sorted-neighbor LCP boilerplate audit -----------------
    // The suffix-array-adjacency trick at document granularity: ONE
    // partitioned sort (first-token blocking), each doc's longest
    // common token prefix with its sorted predecessor — template
    // openings and shared headers surface as long LCPs with no pair
    // join anywhere. First doc per block: lcp null. LCP is position
    // arithmetic (array_min over mismatch positions), not a fold.
    QueryDef("q225_sorted_lcp",
      (s, d) => graft.ops.Text.sortedNeighborLcp(
          documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS tks
        |    FROM documents),
        |o AS (SELECT doc_id, tks, CAST(len(tks) AS BIGINT) AS n,
        |    coalesce(tks[1], '') AS ft,
        |    array_to_string(tks, ' ') AS key FROM t),
        |l AS (SELECT doc_id, tks, n,
        |    lag(tks) OVER (PARTITION BY ft ORDER BY key, doc_id) AS prev
        |  FROM o)
        |SELECT doc_id, n AS n_tokens,
        |  CASE WHEN prev IS NULL THEN NULL ELSE
        |    CAST(coalesce(list_min(list_filter(
        |        generate_series(1, least(len(tks), len(prev))),
        |        i -> tks[i] <> prev[i])) - 1,
        |      least(len(tks), len(prev))) AS BIGINT) END AS lcp
        |FROM l ORDER BY doc_id""".stripMargin)),

    // ---- q226: embedding centroid drift between hash splits ----------
    // Representation-drift audit: per label, the cosine between the
    // train-split and val-split centroid (q81 hash split). Components
    // quantize to millis (the q147/q201 round-parity discipline), so
    // centroid sums, the dot, and both squared norms are exact
    // BIGINTs; the only floats are two correctly-rounded sqrts and
    // one division at the very end (round 6dp — engine-identical).
    // The corpus shuffles once to (label, split, pos) partial sums;
    // everything after runs on the O(labels × dims) centroid frame.
    QueryDef("q226_centroid_drift",
      (s, d) => {
        val h = Sampling.hashLong(col("vec_id"))
        val comp = embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            when(h % 100 < 80, lit("train")).otherwise(lit("val"))
              .as("split"),
            posexplode(col("embedding")))
          .select(col("label"), col("split"), col("pos"),
            round(col("col").cast("double") * 1000, 0).cast("long").as("q"))
        val cent = comp.groupBy("label", "split", "pos")
          .agg(sum("q").as("s"))
        val tr = cent.where(col("split") === "train")
          .select(col("label"), col("pos"), col("s").as("sa"))
        val va = cent.where(col("split") === "val")
          .select(col("label"), col("pos"), col("s").as("sb"))
        val dots = tr.join(va, Seq("label", "pos"))
          .groupBy("label")
          .agg(sum(col("sa") * col("sb")).as("dot"),
            sum(col("sa") * col("sa")).as("na2"),
            sum(col("sb") * col("sb")).as("nb2"))
        val ns = embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            when(h % 100 < 80, 1L).otherwise(0L).as("tr"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_total"), sum("tr").as("n_train"))
        dots.join(ns, Seq("label"))
          .select(col("label"), col("n_train"),
            (col("n_total") - col("n_train")).as("n_val"), col("dot"),
            round(col("dot") / (sqrt(col("na2")) * sqrt(col("nb2"))), 6)
              .as("cos_drift"))
          .orderBy("label")
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    embedding,
        |    CASE WHEN ${DuckSql.hashLong("vec_id")} % 100 < 80
        |      THEN 'train' ELSE 'val' END AS split
        |  FROM embeddings),
        |c0 AS (SELECT label, split, unnest(list_transform(
        |    generate_series(1, len(embedding)), i -> {'p': i,
        |      'q': CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0)
        |        AS BIGINT)})) AS pq FROM e),
        |comp AS (SELECT label, split, (pq).p AS pos, (pq).q AS q FROM c0),
        |cent AS (SELECT label, split, pos, CAST(sum(q) AS BIGINT) AS s
        |  FROM comp GROUP BY 1, 2, 3),
        |j AS (SELECT a.label,
        |    CAST(sum(a.s * b.s) AS BIGINT) AS dot,
        |    CAST(sum(a.s * a.s) AS BIGINT) AS na2,
        |    CAST(sum(b.s * b.s) AS BIGINT) AS nb2
        |  FROM cent a JOIN cent b ON a.label = b.label AND a.pos = b.pos
        |  WHERE a.split = 'train' AND b.split = 'val' GROUP BY 1),
        |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_train
        |  FROM e GROUP BY 1)
        |SELECT j.label, n.n_train, n.n_total - n.n_train AS n_val, j.dot,
        |  round(j.dot / (sqrt(j.na2) * sqrt(j.nb2)), 6) AS cos_drift
        |FROM j JOIN n ON n.label = j.label
        |ORDER BY j.label""".stripMargin)),

    // ---- q227: exponential time-decay scoring, exact integers --------
    // Recency-weighted scoring without pow(): half-life decay as a
    // power-of-two divisor — contribution = cents div 2^(age_weeks),
    // age anchored to a fixed reference date so the number is a
    // constant of the data. The standard trending/freshness score
    // (q95's counterpart) with zero float accumulation; values are
    // non-negative so truncating div and floor div agree across
    // engines. One map-side-combining agg.
    QueryDef("q227_decay_score",
      (s, d) => events(s, d)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          expr("datediff(DATE'2024-02-01', CAST(ts AS DATE)) div 7")
            .cast("int").as("w"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("cents").as("raw_cents"),
          sum(expr("cents div shiftleft(1L, w)")).as("decayed_cents"))
        .orderBy("event_type"),
      Some("""WITH e AS (SELECT event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    datediff('day', CAST(ts AS DATE), DATE '2024-02-01') // 7 AS w
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS raw_cents,
        |  CAST(sum(cents // (1 << w)) AS BIGINT) AS decayed_cents
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q228: inter-rater agreement (Cohen's kappa), exact ----------
    // Label-quality audit for annotation pipelines: two deterministic
    // 3-class raters (different md5 salts, both correlated with
    // n_chars so kappa lands above chance), kappa as ONE integer
    // ratio: kappa = (po − pe)/(1 − pe) cross-multiplies to
    // (agree·n − Σ_c nA_c·nB_c)·10⁶ div (n² − Σ_c nA_c·nB_c). The
    // marginal products come off a 3-row class frame; the corpus is
    // scanned once, aggregated map-side.
    QueryDef("q228_cohens_kappa",
      (s, d) => {
        def rater(salt: String) = {
          val h = Sampling.hashLong(
            concat(col("doc_id").cast("string"), lit(salt)))
          when(col("n_chars") + h % 200 > 450, 2L)
            .when(col("n_chars") + h % 200 > 250, 1L).otherwise(0L)
        }
        val rated = documents(s, d).select(
          rater("#ra").as("ra"), rater("#rb").as("rb"))
        val agree = rated.agg(count(lit(1)).as("n"),
          sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("agree"))
        val cls = s.range(3).select(col("id").as("c"))
        val ma = rated.groupBy(col("ra").as("c")).agg(count(lit(1)).as("na"))
        val mb = rated.groupBy(col("rb").as("c")).agg(count(lit(1)).as("nb"))
        val pe = cls.join(ma, Seq("c"), "left").join(mb, Seq("c"), "left")
          .agg(sum(coalesce(col("na"), lit(0L)) *
            coalesce(col("nb"), lit(0L))).as("pe_num"))
        agree.crossJoin(broadcast(pe))
          .select(col("n"), col("agree"), col("pe_num"),
            expr("((agree * n - pe_num) * 1000000L) div (n * n - pe_num)")
              .as("kappa_ppm"))
      },
      Some(s"""WITH r AS (SELECT
        |    CASE WHEN n_chars + ${DuckSql.hashLong("doc_id || '#ra'")} % 200
        |           > 450 THEN 2
        |         WHEN n_chars + ${DuckSql.hashLong("doc_id || '#ra'")} % 200
        |           > 250 THEN 1 ELSE 0 END AS ra,
        |    CASE WHEN n_chars + ${DuckSql.hashLong("doc_id || '#rb'")} % 200
        |           > 450 THEN 2
        |         WHEN n_chars + ${DuckSql.hashLong("doc_id || '#rb'")} % 200
        |           > 250 THEN 1 ELSE 0 END AS rb
        |  FROM documents),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree
        |  FROM r),
        |c AS (SELECT unnest(generate_series(0, 2)) AS c),
        |ma AS (SELECT ra AS c, count(*) AS na FROM r GROUP BY 1),
        |mb AS (SELECT rb AS c, count(*) AS nb FROM r GROUP BY 1),
        |pe AS (SELECT CAST(sum(coalesce(na, 0) * coalesce(nb, 0))
        |    AS BIGINT) AS pe_num
        |  FROM c LEFT JOIN ma USING (c) LEFT JOIN mb USING (c))
        |SELECT ag.n, ag.agree, pe.pe_num,
        |  CAST(((ag.agree * ag.n - pe.pe_num) * 1000000)
        |    // (ag.n * ag.n - pe.pe_num) AS BIGINT) AS kappa_ppm
        |FROM ag, pe""".stripMargin)),

    // ---- q229: label-propagation communities -------------------------
    // Community detection over the co-purchase graph (q171's edges):
    // a different question from the CC family — CC answers
    // reachability, LPA clusters by connection DENSITY. Two
    // deterministic synchronous rounds (argmax neighbor label, count
    // desc / label asc), each one broadcast-join + combining count on
    // the once-laid-out edges; the oracle replays both rounds as
    // chained CTEs (the q145 discipline).
    QueryDef("q229_label_propagation",
      (s, d) => {
        val li = lineitem(s, d).where(col("l_orderkey") % 7 === 0)
          .select("l_orderkey", "l_partkey")
        val e = li.withColumnRenamed("l_partkey", "src")
          .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
          .where(col("src") < col("dst"))
          .select("src", "dst")
        Graph.labelPropagation(e, "src", "dst", rounds = 2)
          .orderBy("id")
      },
      Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |    WHERE l_orderkey % 7 = 0),
        |d AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey <> b.l_partkey),
        |l0 AS (SELECT DISTINCT src AS id, src AS label FROM d),
        |c1 AS (SELECT d.dst AS id, l.label, count(*) AS c
        |  FROM d JOIN l0 l ON l.id = d.src GROUP BY 1, 2),
        |b1 AS (SELECT id, label FROM c1
        |  QUALIFY row_number() OVER (PARTITION BY id
        |    ORDER BY c DESC, label) = 1),
        |l1 AS (SELECT l0.id, coalesce(b1.label, l0.label) AS label
        |  FROM l0 LEFT JOIN b1 USING (id)),
        |c2 AS (SELECT d.dst AS id, l.label, count(*) AS c
        |  FROM d JOIN l1 l ON l.id = d.src GROUP BY 1, 2),
        |b2 AS (SELECT id, label FROM c2
        |  QUALIFY row_number() OVER (PARTITION BY id
        |    ORDER BY c DESC, label) = 1),
        |l2 AS (SELECT l1.id, coalesce(b2.label, l1.label) AS label
        |  FROM l1 LEFT JOIN b2 USING (id))
        |SELECT id, label FROM l2 ORDER BY id""".stripMargin)),

    // ---- q230: point-in-time (temporal) join against SCD2 ------------
    // Feature-store training-data correctness: each observation joins
    // the dimension version VALID AT ITS TIME — t ∈ [valid_from,
    // valid_to) over q100's SCD2 history (upsert@1, delete@2 for
    // key%10=0, re-insert@3 for key%20=0), so deleted periods emit
    // nulls instead of leaking the future re-insert. Equi-join on the
    // key with the validity window as a residual filter — per-key
    // version chains are short, so the join never amplifies; the
    // 3-row observation clock rides a broadcast.
    QueryDef("q230_temporal_join",
      (s, d) => {
        import graft.ops.Relational
        val base = customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        val k = col("c_custkey")
        val changes = base.where(k % 10 <= 1)
          .select(k, lit("upsert").as("op"), lit(1L).as("seq"),
            col("c_name"), col("c_acctbal"))
          .unionAll(base.where(k % 10 === 0)
            .select(k, lit("delete").as("op"), lit(2L).as("seq"),
              col("c_name"), col("c_acctbal")))
          .unionAll(base.where(k % 20 === 0)
            .select(k, lit("upsert").as("op"), lit(3L).as("seq"),
              concat(col("c_name"), lit("_v2")).as("c_name"),
              (col("c_acctbal") + 50).as("c_acctbal")))
        val dim = Relational.scd2History(changes, "c_custkey", "op", "seq")
          .select(col("c_custkey").as("k"), col("c_name"),
            col("c_acctbal"), col("valid_from"), col("valid_to"))
        val facts = base.where(k % 10 <= 1).select(k)
          .crossJoin(broadcast(s.range(1, 4).select(col("id").as("t"))))
        facts.join(dim,
            facts("c_custkey") === dim("k") &&
              col("t") >= col("valid_from") &&
              (col("valid_to").isNull || col("t") < col("valid_to")),
            "left")
          .select(facts("c_custkey"), col("t"), col("c_name"),
            col("c_acctbal"))
          .orderBy("c_custkey", "t")
      },
      Some("""WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |ch AS (
        |  SELECT c_custkey, 'upsert' AS op, CAST(1 AS BIGINT) AS seq,
        |      c_name, c_acctbal
        |    FROM base WHERE c_custkey % 10 <= 1
        |  UNION ALL SELECT c_custkey, 'delete', 2, c_name, c_acctbal
        |    FROM base WHERE c_custkey % 10 = 0
        |  UNION ALL SELECT c_custkey, 'upsert', 3, c_name || '_v2',
        |      c_acctbal + 50
        |    FROM base WHERE c_custkey % 20 = 0),
        |h AS (SELECT *, lead(seq) OVER (PARTITION BY c_custkey
        |    ORDER BY seq, op) AS valid_to FROM ch),
        |dim AS (SELECT c_custkey AS k, c_name, c_acctbal,
        |    seq AS valid_from, valid_to FROM h WHERE op = 'upsert'),
        |f AS (SELECT c_custkey, unnest(generate_series(1, 3)) AS t
        |  FROM base WHERE c_custkey % 10 <= 1)
        |SELECT f.c_custkey, CAST(f.t AS BIGINT) AS t, d.c_name, d.c_acctbal
        |FROM f LEFT JOIN dim d ON d.k = f.c_custkey
        |  AND f.t >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.t < d.valid_to)
        |ORDER BY 1, 2""".stripMargin)),

    // ---- q231: exact interpolated percentiles (percentile_cont) ------
    // Closes the percentile family (disc q71/q144, approx q90, domain
    // thresholds q182/q189): percentile_cont semantics replayed in
    // pure integers — results ×100 so v_lo·(100−r) + v_hi·r is exact.
    // Never sorts the fact table: combining counts to the (group,
    // cents) domain frame, cumulative window over THAT, two
    // conditional-min order-statistic picks per percentile. Both
    // engines run the same arithmetic — no trust in any built-in
    // quantile's rounding.
    QueryDef("q231_percentile_cont",
      (s, d) => {
        import graft.ops.Relational
        val cents = lineitem(s, d).select(col("l_returnflag"),
          (col("l_extendedprice") * 100).cast("long").as("cents"))
        Relational.percentileContExact(cents, "l_returnflag", "cents",
            Seq(50, 90))
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (SELECT l_returnflag AS g,
        |    CAST(l_extendedprice * 100 AS BIGINT) AS v, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT g, v,
        |    sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY g) AS n FROM c),
        |a AS (SELECT g,
        |    min(CASE WHEN cum >= ((n-1)*50)//100 + 1 THEN v END) AS lo50,
        |    min(CASE WHEN cum >= least(((n-1)*50)//100 + 2, n) THEN v END)
        |      AS hi50,
        |    max((n-1)*50 % 100) AS r50,
        |    min(CASE WHEN cum >= ((n-1)*90)//100 + 1 THEN v END) AS lo90,
        |    min(CASE WHEN cum >= least(((n-1)*90)//100 + 2, n) THEN v END)
        |      AS hi90,
        |    max((n-1)*90 % 100) AS r90
        |  FROM w GROUP BY 1)
        |SELECT g AS l_returnflag,
        |  CAST(lo50 * (100 - r50) + hi50 * r50 AS BIGINT) AS p50_x100,
        |  CAST(lo90 * (100 - r90) + hi90 * r90 AS BIGINT) AS p90_x100
        |FROM a ORDER BY 1""".stripMargin)),

    // ---- q233: rendezvous (HRW) sharding + minimal movement ----------
    // Highest-random-weight routing: doc's owner = argmax over shards
    // of md5(doc_id # shard) — pure map-side expression, no routing
    // table. The property that matters operationally: removing shard 7
    // re-routes ONLY shard 7's documents (an argmax over a subset that
    // still contains the old winner is unchanged), so `gained` across
    // surviving shards sums to exactly shard 7's population. The
    // output hash-verifies that minimal-movement arithmetic.
    QueryDef("q233_rendezvous_sharding",
      (s, d) => {
        def owner(n: Int) = array_max(
          transform(sequence(lit(0), lit(n - 1)), sh =>
            struct(
              conv(substring(md5(concat(col("doc_id").cast("string"),
                lit("#"), sh.cast("string"))), 1, 8), 16, 10)
                .cast("long").as("h"),
              sh.cast("long").as("s")))).getField("s")
        val owned = documents(s, d)
          .select(owner(8).as("s8"), owner(7).as("s7"))
        val n8 = owned.groupBy(col("s8").as("shard"))
          .agg(count(lit(1)).as("n8"))
        val n7 = owned.groupBy(col("s7").as("shard"))
          .agg(count(lit(1)).as("n7"))
        s.range(8).select(col("id").as("shard"))
          .join(n8, Seq("shard"), "left").join(n7, Seq("shard"), "left")
          .select(col("shard"),
            coalesce(col("n8"), lit(0L)).as("n8"),
            coalesce(col("n7"), lit(0L)).as("n7"),
            (coalesce(col("n7"), lit(0L)) - coalesce(col("n8"), lit(0L)))
              .as("gained"))
          .orderBy("shard")
      },
      Some(s"""WITH x AS (SELECT doc_id,
        |    unnest(generate_series(0, 7)) AS sh FROM documents),
        |h AS (SELECT doc_id, sh,
        |    ${DuckSql.hashLong("doc_id || '#' || sh")} AS hv FROM x),
        |o8 AS (SELECT doc_id, sh AS s8 FROM h
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |    ORDER BY hv DESC, sh DESC) = 1),
        |o7 AS (SELECT doc_id, sh AS s7 FROM h WHERE sh < 7
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |    ORDER BY hv DESC, sh DESC) = 1),
        |n8 AS (SELECT s8 AS shard, count(*) AS n8 FROM o8 GROUP BY 1),
        |n7 AS (SELECT s7 AS shard, count(*) AS n7 FROM o7 GROUP BY 1)
        |SELECT s.shard, CAST(coalesce(n8.n8, 0) AS BIGINT) AS n8,
        |  CAST(coalesce(n7.n7, 0) AS BIGINT) AS n7,
        |  CAST(coalesce(n7.n7, 0) - coalesce(n8.n8, 0) AS BIGINT) AS gained
        |FROM (SELECT unnest(generate_series(0, 7)) AS shard) s
        |LEFT JOIN n8 USING (shard) LEFT JOIN n7 USING (shard)
        |ORDER BY shard""".stripMargin)),

    // ---- q234: Merkle-style partition digests (anti-entropy) ---------
    // Which partitions differ between two replicas, without comparing
    // rows: per shard, an order-insensitive content digest (sum of
    // 32-bit row fingerprints — commutative, mergeable, exactly the
    // reaggregation algebra q151/q202 rest on). Replica B is replica A
    // with doc_id % 97 == 0 documents perturbed; only shards holding a
    // perturbed doc report dirty. At scale this is the sync audit that
    // avoids shipping 100 TB to find a 2-row diff.
    QueryDef("q234_partition_digest",
      (s, d) => {
        val shard = Sampling.hashBucket(col("doc_id"), 8).as("shard")
        def digest(textCol: org.apache.spark.sql.Column) = sum(
          Sampling.hashLong(concat(col("doc_id").cast("string"), lit(":"),
            md5(textCol))))
        documents(s, d)
          .select(col("doc_id"), col("text"), shard)
          .groupBy("shard")
          .agg(count(lit(1)).as("n"),
            digest(col("text")).as("digest_a"),
            digest(when(col("doc_id") % 97 === 0,
              concat(col("text"), lit("x"))).otherwise(col("text")))
              .as("digest_b"))
          .withColumn("dirty", col("digest_a") =!= col("digest_b"))
          .orderBy("shard")
      },
      Some(s"""WITH r AS (SELECT doc_id, text,
        |    ${DuckSql.hashLong("doc_id")} % 8 AS shard,
        |    CASE WHEN doc_id % 97 = 0 THEN text || 'x' ELSE text END AS tb
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(${DuckSql.hashLong("doc_id || ':' || md5(text)")})
        |    AS BIGINT) AS digest_a,
        |  CAST(sum(${DuckSql.hashLong("doc_id || ':' || md5(tb)")})
        |    AS BIGINT) AS digest_b,
        |  sum(${DuckSql.hashLong("doc_id || ':' || md5(text)")})
        |    <> sum(${DuckSql.hashLong("doc_id || ':' || md5(tb)")}) AS dirty
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q235: A/B comparison with Welch's t, exact moments ----------
    // Data-ablation experiment readout: users hash-split into arms,
    // per event_type the Welch t-statistic on value. Every moment is
    // an exact BIGINT (counts, cent sums, cent² sums — the variance
    // numerator n·Σx² − (Σx)² never sees a float), so the only doubles
    // are the final divisions/sqrt — the SAME IEEE expression on both
    // engines, rounded at 6dp. One map-side-combining agg; the
    // per-arm pivot happens via conditional sums, never a join.
    QueryDef("q235_ab_ttest",
      (s, d) => {
        val arm = (Sampling.hashLong(col("user_id")) % 2 === 0)
        val cents = round(col("value") * 100, 0).cast("long")
        val g = events(s, d).select(col("event_type"),
            when(arm, 1L).otherwise(0L).as("a"),
            cents.as("x"))
          .groupBy("event_type")
          .agg(sum("a").as("na"), sum(lit(1L) - col("a")).as("nb"),
            sum(col("a") * col("x")).as("sa"),
            sum((lit(1L) - col("a")) * col("x")).as("sb"),
            sum(col("a") * col("x") * col("x")).as("qa"),
            sum((lit(1L) - col("a")) * col("x") * col("x")).as("qb"))
        g.select(col("event_type"), col("na"), col("nb"),
            round((col("sa").cast("double") / col("na")) -
              (col("sb").cast("double") / col("nb")), 6).as("mean_diff"),
            round(((col("sa").cast("double") / col("na")) -
              (col("sb").cast("double") / col("nb"))) /
              sqrt(
                ((col("na") * col("qa") - col("sa") * col("sa")).cast("double") /
                  (col("na").cast("double") * (col("na") - 1))) / col("na") +
                ((col("nb") * col("qb") - col("sb") * col("sb")).cast("double") /
                  (col("nb").cast("double") * (col("nb") - 1))) / col("nb")),
              6).as("t_stat"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (SELECT event_type,
        |    CASE WHEN ${DuckSql.hashLong("user_id")} % 2 = 0
        |      THEN 1 ELSE 0 END AS a,
        |    CAST(round(value * 100, 0) AS BIGINT) AS x
        |  FROM events),
        |g AS (SELECT event_type,
        |    CAST(sum(a) AS BIGINT) AS na,
        |    CAST(sum(1 - a) AS BIGINT) AS nb,
        |    CAST(sum(a * x) AS BIGINT) AS sa,
        |    CAST(sum((1 - a) * x) AS BIGINT) AS sb,
        |    CAST(sum(a * x * x) AS BIGINT) AS qa,
        |    CAST(sum((1 - a) * x * x) AS BIGINT) AS qb
        |  FROM e GROUP BY 1)
        |SELECT event_type, na, nb,
        |  round(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb, 6)
        |    AS mean_diff,
        |  round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
        |    sqrt(
        |      (CAST(na * qa - sa * sa AS DOUBLE) /
        |        (CAST(na AS DOUBLE) * (na - 1))) / na +
        |      (CAST(nb * qb - sb * sb AS DOUBLE) /
        |        (CAST(nb AS DOUBLE) * (nb - 1))) / nb),
        |    6) AS t_stat
        |FROM g ORDER BY 1""".stripMargin)),

    // ---- q236: incremental view maintenance (IVM) ---------------------
    // The don't-recompute-the-world primitive: a materialized per-
    // customer aggregate (n orders, total cents) built from the
    // pre-cutoff fact slice is UPDATED with the post-cutoff delta by
    // pure reaggregation algebra (counts and sums add; the q151/q202
    // merge discipline) — new keys appear via the full-outer union,
    // nothing rescans the base slice. The oracle is the full
    // recompute, so the maintained view must equal it exactly.
    QueryDef("q236_incremental_view",
      (s, d) => {
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        def aggOf(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum(cents).as("cents"))
        val cut = lit("1996-01-01").cast("date")
        val base = aggOf(orders(s, d).where(col("o_orderdate") < cut))
        val delta = aggOf(orders(s, d).where(col("o_orderdate") >= cut))
        base.unionByName(delta)
          .groupBy("o_custkey")
          .agg(sum("n").as("n"), sum("cents").as("cents"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q237: HTML boilerplate strip, round-trip verified -----------
    // The web-extraction stage (trafilatura-lite): each doc is wrapped
    // in deterministic markup (tags, an entity encoding, a nav link —
    // both engines build the identical page), then the extractor
    // strips tags, decodes the entity, and normalizes whitespace. The
    // gate: normText(extracted) must equal normText(original) —
    // md5-compared per doc, reported per lang. Tag stripping is one
    // RE2∩Java-dialect regexp_replace (q139 discipline); everything is
    // embarrassingly parallel map work.
    QueryDef("q237_html_strip",
      (s, d) => {
        import graft.ops.Text
        val html = concat(lit("<html><body><nav><a href=\"http://h"),
          (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), col("doc_id").cast("string"),
          lit("\">home</a></nav><p class=\"main\">"),
          regexp_replace(col("text"), "e", "&#101;"),
          lit("</p><br/><footer>(c) corp</footer></body></html>"))
        val stripped = regexp_replace(
          regexp_replace(html, "<(nav|footer)>.*?</(nav|footer)>", " "),
          "<[^>]*>", " ")
        val decoded = regexp_replace(stripped, "&#101;", "e")
        documents(s, d)
          .select(col("lang"),
            (md5(Text.normText(decoded)) === md5(Text.normText(col("text"))))
              .cast("long").as("ok"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("ok").as("n_ok"))
          .orderBy("lang")
      },
      Some(s"""WITH h AS (SELECT lang, text,
        |    '<html><body><nav><a href="http://h' || (doc_id % 7)
        |    || '.example.com/p' || doc_id || '">home</a></nav><p class="main">'
        |    || replace(text, 'e', '&#101;')
        |    || '</p><br/><footer>(c) corp</footer></body></html>' AS html
        |  FROM documents),
        |x AS (SELECT lang, text, regexp_replace(regexp_replace(regexp_replace(
        |    html, '<(nav|footer)>.*?</(nav|footer)>', ' ', 'g'),
        |    '<[^>]*>', ' ', 'g'), '&#101;', 'e', 'g') AS extracted
        |  FROM h)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN md5(${DuckSql.norm("extracted")})
        |    = md5(${DuckSql.norm("text")}) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ok
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q238: outlink extraction + host in-degree -------------------
    // The crawl-frontier feed: every href host extracted with ONE
    // regexp_extract_all pass (no parser), exploded, counted — the
    // host in-degree ranking that seeds crawl prioritization and the
    // domain-blocklist join (q193). Links are deterministic (three per
    // doc, two hash-spread hosts and one constant), so the ranking is
    // a constant of the data.
    QueryDef("q238_outlink_hosts",
      (s, d) => {
        documents(s, d)
          .select(explode(expr(
            """regexp_extract_all(""" +
              """concat('<a href="http://h', cast(doc_id % 7 as string),""" +
              """ '.example.com/x">a</a><a href="http://m',""" +
              """ cast((doc_id * 3) % 11 as string),""" +
              """ '.mirror.net/y">b</a><a href="https://static.example/z">c</a>'),""" +
              """ 'href="https?://([^/"]+)', 1)""")).as("host"))
          .groupBy("host").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("host"))
      },
      Some("""WITH h AS (SELECT
        |    '<a href="http://h' || (doc_id % 7)
        |    || '.example.com/x">a</a><a href="http://m' || ((doc_id * 3) % 11)
        |    || '.mirror.net/y">b</a><a href="https://static.example/z">c</a>'
        |      AS html
        |  FROM documents),
        |l AS (SELECT unnest(regexp_extract_all(html,
        |    'href="https?://([^/"]+)', 1)) AS host FROM h)
        |SELECT host, CAST(count(*) AS BIGINT) AS n
        |FROM l GROUP BY 1 ORDER BY n DESC, host""".stripMargin)),

    // ---- q239: audio near-dup via energy-envelope fingerprints -------
    // Dedup across the THIRD modality (text q42/q172, image q220):
    // deterministic clips share a class envelope (key%13) with one
    // window's amplitude perturbed per key, the REAL RIFF/PCM byte
    // walk computes the 64-window energy fingerprint, and the same
    // 8-band Hamming join used for images finds near-identical clips —
    // one generic pair operator serves every 64-bit fingerprint. Bits
    // have closed form (windows are constant-amplitude: bit ⟺
    // 64·amp_w ≥ Σamp), so the brute-force oracle replays exactly.
    QueryDef("q239_audio_neardup",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val v = (key % 13).toInt; val p = (key % 64).toInt
          val samples = Array.tabulate[Short](64 * 80) { i =>
            val w = i / 80
            ((v * 53 + w * w * 29) % 997 +
              (if (w == p) 300 else 0)).toShort
          }
          Multimodal.makeWav(16000, 1, samples)
        }
        val hashed = part(s, d).where(col("p_partkey") <= 150)
          .select(col("p_partkey").as("id"),
            Multimodal.audioFingerprint(mk(col("p_partkey"))).as("h"))
          .select(col("id"), col("h.hash_hi").as("hash_hi"),
            col("h.hash_lo").as("hash_lo"))
        Dedup.hammingNearDupPairs64(hashed, "id", "hash_hi", "hash_lo",
            maxHamming = 6)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH k AS (SELECT p_partkey, p_partkey % 13 AS v,
        |    p_partkey % 64 AS p FROM part WHERE p_partkey <= 150),
        |a AS (SELECT p_partkey, list_transform(generate_series(0, 63), w ->
        |    (v * 53 + w * w * 29) % 997
        |    + CASE WHEN w = p THEN 300 ELSE 0 END) AS amp FROM k),
        |t AS (SELECT p_partkey, amp, CAST(list_sum(amp) AS BIGINT) AS total
        |  FROM a),
        |bits AS (SELECT p_partkey, list_transform(generate_series(1, 64),
        |    w -> CASE WHEN 64 * amp[w] >= total THEN 1 ELSE 0 END) AS bit
        |  FROM t),
        |h AS (SELECT p_partkey,
        |    CAST(list_sum(list_transform(generate_series(33, 64),
        |      w -> bit[w] * (CAST(1 AS BIGINT) << (w - 33)))) AS BIGINT) AS hi,
        |    CAST(list_sum(list_transform(generate_series(1, 32),
        |      w -> bit[w] * (CAST(1 AS BIGINT) << (w - 1)))) AS BIGINT) AS lo
        |  FROM bits)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |    AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.p_partkey < b.p_partkey
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 6
        |ORDER BY 1, 2""".stripMargin)),

    // ---- q240: MP4 box-structure audit --------------------------------
    // The video-container counterpart of the RIFF walk: a REAL
    // ISO-BMFF box parser (u32-BE sizes, 4CC types, 64-bit largesize
    // when size==1, truncation = valid=false) over deterministic box
    // streams — keys ≡ 0 (mod 5) carry a largesize free box, so both
    // header widths are exercised. Output: box count, moov present,
    // media payload bytes — the playability/size triage a video-ingest
    // pipeline runs before ever touching a codec. Closed-form oracle
    // from the synthesis parameters.
    QueryDef("q240_mp4_boxes",
      (s, d) => {
        val mk = udf { (key: Long) =>
          Multimodal.makeMp4Boxes(
            moovPayload = (key % 32).toInt,
            mdatPayload = ((key * 7) % 100).toInt,
            withLargesize = key % 5 == 0)
        }
        part(s, d).where(col("p_partkey") <= 150)
          .select(col("p_partkey"),
            Multimodal.mp4Metadata(mk(col("p_partkey"))).as("m"))
          .select(col("p_partkey"),
            col("m.n_boxes").as("n_boxes"),
            col("m.has_moov").as("has_moov"),
            col("m.mdat_bytes").as("mdat_bytes"),
            col("m.valid").as("valid"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
        |  CAST(CASE WHEN p_partkey % 5 = 0 THEN 4 ELSE 3 END AS BIGINT)
        |    AS n_boxes,
        |  true AS has_moov,
        |  CAST((p_partkey * 7) % 100 AS BIGINT) AS mdat_bytes,
        |  true AS valid
        |FROM part WHERE p_partkey <= 150 ORDER BY p_partkey""".stripMargin)))
}
