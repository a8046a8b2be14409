package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Graph, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 widening: scale-pattern operators a 100 TB curation job
  * leans on beyond the core inventory — bounded-round graph traversal,
  * mergeable-sketch set algebra, two-level partial-aggregate rollup,
  * Z-order clustering for zone-map pruning, bigram language-model
  * scoring, and asymmetric (containment) near-dup detection. Every
  * query is exact/deterministic by construction so the DuckDB oracle
  * hash-verifies it, sketches included.
  */
object QueriesScaleExt {

  // mirrors QueriesDedup's LSH parameters (shared shingle space)
  private val ShingleN = 3
  private val K = 8
  private val Bands = 4

  /** DuckDB CTEs: tokens -> shingles -> signature -> band keys -> cand
    * (same construction as QueriesDedup.lshCtes; duplicated because the
    * original is private to its file — keep the two in lockstep). */
  private def lshCtes(src: String = "documents"): String = {
    val sig = (0 until K).map(j =>
      DuckSql.minhashComponent("shingles", j)).mkString("[", ", ", "]")
    val bands = (0 until Bands).map { b =>
      val rows = K / Bands
      val parts = (0 until rows).map(r => s"sig[${b * rows + r + 1}]").mkString(" || '|' || ")
      s"'$b:' || md5($parts)"
    }.mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS toks FROM $src),
       |sh AS (SELECT doc_id, list_distinct(${DuckSql.shingles("toks", ShingleN)}) AS shingles FROM t),
       |sig AS (SELECT doc_id, $sig AS sig FROM sh),
       |bands AS (SELECT doc_id, unnest($bands) AS band FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b USING (band) WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q149: bounded-round multi-source BFS -----------------------
    // Hop distance from seed parts (id % 97 = 0) over the co-purchase
    // graph: 3 rounds of join+min — the "blast radius" / neighborhood-
    // expansion shape (contamination tracing, related-doc harvesting).
    // Integer distances and min-folds are partition-order-independent,
    // so the oracle replays every round as a chained CTE and the hash
    // check covers the whole traversal.
    QueryDef("q149_bfs_distance",
      (s, d) => {
        val li = lineitem(s, d).select("l_orderkey", "l_partkey")
        // checkpoint the self-join once — seeds AND the BFS both read it
        val e = li.withColumnRenamed("l_partkey", "src")
          .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
          .where(col("src") =!= col("dst"))
          .select("src", "dst")
          .distinct()
          .localCheckpoint()
        val seeds = e.select(col("src").as("id")).where(col("id") % 97 === 0)
        Graph.boundedBfs(e, "src", "dst", seeds, hops = 3)
          .select(col("id").as("part_id"), col("dist"))
          .orderBy("part_id")
      },
      Some {
        def round_(prev: String, curr: String) =
          s"""$curr AS (SELECT id, min(dist) AS dist FROM (
          |    SELECT id, dist FROM $prev
          |    UNION ALL
          |    SELECT e.dst AS id, $prev.dist + 1 AS dist
          |    FROM e JOIN $prev ON $prev.id = e.src) GROUP BY 1)"""
        s"""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |      AND a.l_partkey != b.l_partkey),
        |d0 AS (SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS dist
        |    FROM e WHERE src % 97 = 0),
        |${round_("d0", "d1")},
        |${round_("d1", "d2")},
        |${round_("d2", "d3")}
        |SELECT id AS part_id, dist FROM d3 ORDER BY part_id""".stripMargin
      }),

    // ---- q150: KMV sketch set algebra (union / intersection) --------
    // Distinct-token cardinality of two corpora AND their union /
    // intersection from k-minimum-values sketches — the mergeable-
    // sketch property that makes cross-partition (and cross-dataset)
    // distinct counting a fixed-size problem at 100 TB: a KMV union is
    // just the k smallest of the concatenated sketches, and the
    // intersection estimate is Jaccard-over-the-union-sketch x the
    // union estimate. md5 hashing makes every sketch member — and so
    // the estimates themselves — engine-identical and hash-verifiable
    // (exact counts ride along for calibration).
    QueryDef("q150_kmv_setops",
      (s, d) => {
        val SK = 64
        // sketch the 3-gram shingle space (the synthetic corpus has a
        // ~31-word vocabulary — smaller than any useful k — but
        // thousands of distinct shingles at every SF)
        val toks = documents(s, d)
          .where(col("lang").isin("en", "de"))
          .select(col("lang"),
            explode(Dedup.wordShingles(Text.tokens(col("text")), ShingleN)).as("w"))
        // distinct (lang, hash) rows — the sketch input space
        val hashes = toks.select(col("lang"), md5(col("w")).as("h")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def hLong(c: org.apache.spark.sql.Column) =
          conv(substring(c, 1, 8), 16, 10).cast("long")
        // per-language kth minimum: per-key top-k (rank window is
        // partitioned by lang — parallel across keys, never global)
        val kth = hashes
          .withColumn("rn", row_number().over(Window.partitionBy("lang").orderBy("h")))
          .where(col("rn") === SK)
          .select(col("lang"), hLong(col("h")).as("kth"))
        val estA = kth.where(col("lang") === "en").select(
          round(lit((SK - 1).toDouble * 4294967296.0) / col("kth").cast("double"), 4)
            .as("est_en"))
        val estB = kth.where(col("lang") === "de").select(
          round(lit((SK - 1).toDouble * 4294967296.0) / col("kth").cast("double"), 4)
            .as("est_de"))
        // union sketch: k smallest distinct hashes over both corpora
        // (TakeOrderedAndProject — no global window)
        val uni = hashes.select("h").distinct().orderBy("h").limit(SK)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val estU = uni.agg(max(hLong(col("h"))).as("kth")).select(
          round(lit((SK - 1).toDouble * 4294967296.0) / col("kth").cast("double"), 4)
            .as("est_union"))
        // Jaccard over the union sketch: members present in BOTH sets
        val jn = uni
          .join(hashes.where(col("lang") === "en").select(col("h")), Seq("h"), "left_semi")
          .join(hashes.where(col("lang") === "de").select(col("h")), Seq("h"), "left_semi")
          .agg(count(lit(1)).as("j_num"))
        val exact = hashes.agg(
          count_distinct(when(col("lang") === "en", col("h"))).as("exact_en"),
          count_distinct(when(col("lang") === "de", col("h"))).as("exact_de"),
          count_distinct(col("h")).as("exact_union"))
        // single-row scalar frames — broadcast crossJoin is the
        // established scalar-combination shape, not a cartesian product
        estA.crossJoin(broadcast(estB)).crossJoin(broadcast(estU))
          .crossJoin(broadcast(jn)).crossJoin(broadcast(exact))
          .select(col("est_en"), col("est_de"), col("est_union"),
            col("j_num").cast("bigint").as("j_num"),
            round(col("j_num") / lit(SK.toDouble) * col("est_union"), 4)
              .as("est_intersection"),
            col("exact_en"), col("exact_de"), col("exact_union"))
      },
      Some {
        val SK = 64
        val est = (kth: String) => s"round(63.0 * 4294967296.0 / CAST($kth AS DOUBLE), 4)"
        s"""WITH tk AS (SELECT lang, ${DuckSql.toks("text")} AS toks
        |    FROM documents WHERE lang IN ('en', 'de')),
        |sgl AS (SELECT lang, unnest(${DuckSql.shingles("toks", ShingleN)}) AS w FROM tk),
        |h AS (SELECT DISTINCT lang, md5(w) AS h FROM sgl),
        |ken AS (SELECT h FROM h WHERE lang = 'en' ORDER BY h LIMIT $SK),
        |kde AS (SELECT h FROM h WHERE lang = 'de' ORDER BY h LIMIT $SK),
        |ku AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT $SK),
        |kth AS (SELECT
        |    (SELECT ${DuckSql.hexLong("max(h)")} FROM ken) AS kth_en,
        |    (SELECT ${DuckSql.hexLong("max(h)")} FROM kde) AS kth_de,
        |    (SELECT ${DuckSql.hexLong("max(h)")} FROM ku) AS kth_u),
        |j AS (SELECT count(*) AS j_num FROM ku
        |  WHERE h IN (SELECT h FROM h WHERE lang = 'en')
        |    AND h IN (SELECT h FROM h WHERE lang = 'de')),
        |ex AS (SELECT
        |    count(DISTINCT CASE WHEN lang = 'en' THEN h END) AS exact_en,
        |    count(DISTINCT CASE WHEN lang = 'de' THEN h END) AS exact_de,
        |    count(DISTINCT h) AS exact_union FROM h)
        |SELECT ${est("kth_en")} AS est_en, ${est("kth_de")} AS est_de,
        |  ${est("kth_u")} AS est_union, j_num,
        |  round(CAST(j_num AS DOUBLE) / $SK.0 * ${est("kth_u")}, 4) AS est_intersection,
        |  exact_en, exact_de, exact_union
        |FROM kth, j, ex""".stripMargin
      }),

    // ---- q151: two-level partial-aggregate rollup -------------------
    // Monthly revenue statistics computed FROM daily partial
    // aggregates (count / decimal sum / sum-of-squares / min / max)
    // rather than from the base rows — the algebraic-merge property
    // that incremental 100 TB rollup maintenance depends on: yesterday
    // never gets re-scanned, the month is a merge of 31 partials. The
    // oracle computes the months DIRECTLY from orders, so the hash
    // match IS the proof that the two-level merge loses nothing.
    QueryDef("q151_reaggregation",
      (s, d) => {
        val p = col("o_totalprice").cast("decimal(18,2)")
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("cnt"), sum(p).as("s"),
            sum(p * p).as("ss"), min(p).as("mn"), max(p).as("mx"))
        val monthly = daily
          .groupBy(trunc(col("day"), "month").as("month"))
          .agg(sum(col("cnt")).as("n"), sum(col("s")).as("s"),
            sum(col("ss")).as("ss"), min(col("mn")).as("mn"),
            max(col("mx")).as("mx"))
        val n = col("n").cast("double")
        val sD = col("s").cast("double")
        val ssD = col("ss").cast("double")
        // n=1 months: Spark double/0.0 = Infinity but DuckDB = NaN —
        // an undefined deviation must be NULL, not an engine artifact.
        // Stddev (not variance): variance of ~1.5e5-scale prices is
        // ~2e10, and rounding THAT to 6 decimals needs v*1e6 ≈ 2e16 >
        // 2^53 — past double precision, where the engines' round()
        // paths legitimately disagree. sqrt brings the magnitude back
        // to where 6-decimal rounding is well inside the mantissa.
        monthly.select(col("month"),
            col("n").cast("bigint").as("n_orders"),
            round(sD / n, 6).as("mean_price"),
            when(col("n") > 1,
              round(sqrt((ssD - sD * sD / n) / (n - lit(1.0))), 6)).as("sd_price"),
            col("mn").cast("double").as("min_price"),
            col("mx").cast("double").as("max_price"))
          .orderBy("month")
      },
      Some("""SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        |  count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) + 0 AS mean_price,
        |  CASE WHEN count(*) > 1 THEN
        |    round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
        |          * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |      / (count(*) - 1.0)), 6) + 0 END AS sd_price,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q152: Z-order clustering + zone-map span audit -------------
    // Bit-interleave two 8-bit dimensions (customer bucket x order
    // day) into a Z-value, range-bucket rows by Z, and report each
    // bucket's min/max along BOTH dimensions — the locality property
    // that makes multi-column data skipping work: a Z-range bucket
    // bounds every interleaved dimension (span <= 63 of 255 here, ==
    // fixing 2 high bits per dimension), where a lexicographic sort
    // bounds only the leading one. The interleave is integer div/mod
    // on non-negative values (bit-identical in any engine), buckets
    // are static Z-ranges (no global window), and the whole layout
    // decision is hash-verified.
    QueryDef("q152_zorder_layout",
      (s, d) => {
        val base = orders(s, d).select(
          (col("o_custkey") % 256).cast("long").as("x"),
          (datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")) % 256)
            .cast("long").as("y"))
        val z = (0 until 8).map { i =>
          expr(s"((x div ${1L << i}) % 2) * ${1L << (2 * i)}" +
            s" + ((y div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
        }.reduce(_ + _)
        base.withColumn("z", z)
          .withColumn("bucket", expr("z div 4096"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
          .orderBy("bucket")
      },
      Some {
        val z = (0 until 8).map { i =>
          s"((x // ${1L << i}) % 2) * ${1L << (2 * i)}" +
            s" + ((y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
        }.mkString("(", " + ", ")")
        s"""WITH base AS (SELECT
        |    CAST(o_custkey % 256 AS BIGINT) AS x,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS y
        |  FROM orders),
        |zed AS (SELECT x, y, $z AS z FROM base)
        |SELECT z // 4096 AS bucket, count(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM zed GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q153: bigram language-model scoring ------------------------
    // Per-document mean negative log2 bigram probability (perplexity's
    // log form) against a model trained on the corpus itself — the
    // classic LM-based quality filter (high score = improbable word
    // sequences = boilerplate/garbled text). Probabilities are exact
    // integer-count ratios; the per-doc sum is an ORDER-PINNED fold
    // over bigram-sorted terms (q132's discipline: log2 terms have no
    // exact representation, so both engines add them in the same
    // order), making a transcendental-heavy score hash-verifiable.
    QueryDef("q153_bigram_score",
      (s, d) => {
        val t = documents(s, d).where(col("doc_id") < 300)
          .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        val bgs = t.select(col("doc_id"),
            explode(zip_with(
              slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
              slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
              (a, b) => concat(a, lit("#"), b))).as("bg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val global = bgs.groupBy("bg").agg(count(lit(1)).as("cbg"))
        val ctx = bgs.select(split(col("bg"), "#").getItem(0).as("w1"))
          .groupBy("w1").agg(count(lit(1)).as("cw1"))
        val probs = global
          .withColumn("w1", split(col("bg"), "#").getItem(0))
          .join(ctx, "w1")
          .select(col("bg"), (col("cbg").cast("double") / col("cw1").cast("double")).as("p"))
        val perDoc = bgs.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
          .join(probs, "bg")
        perDoc.groupBy("doc_id").agg(
            sum(col("c")).as("n_bigrams"),
            sort_array(collect_list(struct(col("bg"), col("c").cast("double").as("c"),
              col("p")))).as("terms"))
          .select(col("doc_id"),
            col("n_bigrams").cast("bigint").as("n_bigrams"),
            round(-aggregate(col("terms"), lit(0.0),
                (acc, s0) => acc + s0.getField("c") * log2(s0.getField("p")))
              / col("n_bigrams"), 6).as("bigram_nll"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS tk
        |    FROM documents WHERE doc_id < 300),
        |b AS (SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(tk) - 1, 0)),
        |    i -> tk[i] || '#' || tk[i+1])) AS bg FROM t),
        |gb AS (SELECT bg, count(*) AS cbg FROM b GROUP BY 1),
        |cw AS (SELECT string_split(bg, '#')[1] AS w1, count(*) AS cw1
        |    FROM b GROUP BY 1),
        |pr AS (SELECT gb.bg,
        |    CAST(gb.cbg AS DOUBLE) / CAST(cw.cw1 AS DOUBLE) AS p
        |  FROM gb JOIN cw ON cw.w1 = string_split(gb.bg, '#')[1]),
        |dc AS (SELECT doc_id, bg, CAST(count(*) AS DOUBLE) AS c
        |    FROM b GROUP BY 1, 2),
        |a AS (SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_bigrams,
        |    list(dc.c * log2(pr.p) ORDER BY dc.bg) AS terms
        |  FROM dc JOIN pr USING (bg) GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |  round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), terms),
        |    (acc, x) -> acc + x) / n_bigrams, 6) + 0 AS bigram_nll
        |FROM a ORDER BY doc_id""".stripMargin)),

    // ---- q154: shingle containment (asymmetric near-dup) ------------
    // Directional overlap on LSH candidates: containment_in_a =
    // |A∩B| / |A| flags quote/subset duplication that symmetric
    // Jaccard misses (a short doc fully embedded in a long one has
    // high containment but low Jaccard). Reuses the verified
    // candidate-generation + intersection machinery of q42/q43 —
    // still never an all-pairs comparison.
    QueryDef("q154_shingle_containment",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", ShingleN, K, Bands)
        Dedup.jaccard(pairs.select("id_a", "id_b"), docs, "doc_id", "text", ShingleN)
          .select(col("id_a"), col("id_b"), col("n_inter"),
            round(col("n_inter").cast("double") / col("sz_a"), 6).as("cont_in_a"),
            round(col("n_inter").cast("double") / col("sz_b"), 6).as("cont_in_b"))
          .where(greatest(col("cont_in_a"), col("cont_in_b")) >= 0.5)
          .orderBy("id_a", "id_b")
      },
      Some(s"""${lshCtes()},
        |shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        |sz AS (SELECT doc_id, count(*) AS sz FROM shx GROUP BY 1),
        |inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
        |  FROM cand c JOIN shx a ON a.doc_id = c.id_a
        |  JOIN shx b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY 1, 2),
        |cont AS (SELECT i.id_a, i.id_b, i.n_inter,
        |    round(CAST(i.n_inter AS DOUBLE) / za.sz, 6) AS cont_in_a,
        |    round(CAST(i.n_inter AS DOUBLE) / zb.sz, 6) AS cont_in_b
        |  FROM inter i JOIN sz za ON za.doc_id = i.id_a
        |    JOIN sz zb ON zb.doc_id = i.id_b)
        |SELECT * FROM cont
        |WHERE greatest(cont_in_a, cont_in_b) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin))
  )
}
