package graft.queries

import graft.Tables._
import graft.ops.FixedPoint
import org.apache.spark.sql.functions._

/** Round-9 thirteenth batch: probabilistic record linkage
  * (Fellegi–Sunter) and time-series symbolization (SAX) — two more
  * named curation methods as exact-integer lanes.
  */
object QueriesRound9m {

  // Fellegi–Sunter m-priors in milli-units (P(field agrees | match)).
  private val MType = 900L
  private val MTok = 950L
  private val MPrice = 800L

  val defs: Seq[QueryDef] = Seq(

    // ---- q515: Fellegi–Sunter record-linkage weights ------------------------
    // The statistical half of entity resolution (q109 finds fuzzy
    // pairs; this SCORES candidate pairs the way a linkage engine
    // does): per-field u-probabilities estimated from the data as the
    // exact pair-agreement odds u = Σ c_v(c_v−1) / N(N−1), fixed
    // m-priors, and per-pair match weight Σ ±log2(m/u | (1−u)/(1−m))
    // in exact micro-bits on the shared FixedPoint table. Candidates
    // come from (brand, size) blocking — never part×part, but parts
    // per block grow LINEARLY with SF (~n/1250 for ~25 brands × ~50
    // sizes), so pairs per block grow quadratically: ~16 parts/block
    // at sf0.1, ~2.6k pairs/block at sf1, and past that a linkage run
    // adds a third blocking key (tok) exactly like production FS
    // engines re-block. BIGINT bound (the q521/q455 discipline): the
    // fp20 remainder terms inside log2MicroFp20 are (num mod d)·2²⁰
    // with d up to 1000·u_den = 1000·n(n−1), so they stay in BIGINT
    // while 1000·n(n−1) < 2⁴³ ⇔ n ≲ 94k parts (sf ≈ 0.45 at TPC-H's
    // 200k parts/SF); beyond that the ratio lifts to DECIMAL(38) like
    // q455. Both log arguments are > 1 by
    // construction (m > u always here), so every weight is a positive
    // integer and disagreement subtracts — no signed-log machinery.
    QueryDef("q515_fellegi_sunter",
      (s, d) => {
        val p = part(s, d).select(col("p_partkey").as("key"),
          col("p_brand").as("brand"), col("p_size").as("size"),
          col("p_type").as("ptype"),
          split(col("p_name"), " ").getItem(0).as("tok"),
          expr("CAST(round(p_retailprice * 100) AS BIGINT) div 10000")
            .as("pbucket"))
        // u-statistics: one tiny agg per field + the global N
        def uStat(c: String, as: String) = p.groupBy(c)
          .agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1)")).as(as))
        val scalars = p.agg(count(lit(1)).as("n"))
          .crossJoin(uStat("ptype", "u_type"))
          .crossJoin(uStat("tok", "u_tok"))
          .crossJoin(uStat("pbucket", "u_price"))
          .withColumn("u_den", expr("n * (n - 1)"))
        def wAgree(m: Long, uNum: String) = expr(FixedPoint.sparkLog2MicroFp20(
          FixedPoint.sparkRatioFp20(s"($m * u_den - 1000 * $uNum)",
            s"(1000 * $uNum)")))
        def wDis(m: Long, uNum: String) = expr(FixedPoint.sparkLog2MicroFp20(
          FixedPoint.sparkRatioFp20(
            s"((u_den - $uNum) * 1000 - u_den * ${1000 - m})",
            s"(u_den * ${1000 - m})")))
        val weights = scalars.select(
          wAgree(MType, "u_type").as("wa_type"), wDis(MType, "u_type").as("wd_type"),
          wAgree(MTok, "u_tok").as("wa_tok"), wDis(MTok, "u_tok").as("wd_tok"),
          wAgree(MPrice, "u_price").as("wa_price"), wDis(MPrice, "u_price").as("wd_price"))
        val a = p.select(col("key").as("key_a"), col("brand"), col("size"),
          col("ptype").as("type_a"), col("tok").as("tok_a"), col("pbucket").as("pb_a"))
        val b = p.select(col("key").as("key_b"), col("brand"), col("size"),
          col("ptype").as("type_b"), col("tok").as("tok_b"), col("pbucket").as("pb_b"))
        a.join(b, Seq("brand", "size")).where(col("key_a") < col("key_b"))
          .crossJoin(broadcast(weights))
          .select(col("key_a"), col("key_b"),
            (col("type_a") === col("type_b")).cast("long").as("agr_type"),
            (col("tok_a") === col("tok_b")).cast("long").as("agr_tok"),
            (col("pb_a") === col("pb_b")).cast("long").as("agr_price"),
            (when(col("type_a") === col("type_b"), col("wa_type"))
              .otherwise(-col("wd_type")) +
             when(col("tok_a") === col("tok_b"), col("wa_tok"))
              .otherwise(-col("wd_tok")) +
             when(col("pb_a") === col("pb_b"), col("wa_price"))
              .otherwise(-col("wd_price"))).as("score_microbits"))
          .orderBy(desc("score_microbits"), col("key_a"), col("key_b"))
          .limit(50)
      },
      Some {
        // CAST to BIGINT: DuckDB sum() yields HUGEINT, which the
        // binary-format fragment inside duckLog2MicroFp20 rejects
        def uCte(col: String, as: String) =
          s"$as AS (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS v FROM (SELECT $col, count(*) AS c FROM p GROUP BY 1))"
        def wAgree(m: Long, u: String) = FixedPoint.duckLog2MicroFp20(
          FixedPoint.duckRatioFp20(s"($m * u_den - 1000 * $u)", s"(1000 * $u)"))
        def wDis(m: Long, u: String) = FixedPoint.duckLog2MicroFp20(
          FixedPoint.duckRatioFp20(s"((u_den - $u) * 1000 - u_den * ${1000 - m})",
            s"(u_den * ${1000 - m})"))
        s"""WITH p AS (SELECT p_partkey AS key, p_brand AS brand,
        |    p_size AS size, p_type AS ptype,
        |    string_split(p_name, ' ')[1] AS tok,
        |    CAST(round(p_retailprice * 100) AS BIGINT) // 10000 AS pbucket
        |  FROM part),
        |${uCte("ptype", "ut")}, ${uCte("tok", "uk")}, ${uCte("pbucket", "up")},
        |sc AS (SELECT (SELECT count(*) FROM p) AS n,
        |    (SELECT v FROM ut) AS u_type, (SELECT v FROM uk) AS u_tok,
        |    (SELECT v FROM up) AS u_price),
        |sc2 AS (SELECT CAST(n * (n - 1) AS BIGINT) AS u_den,
        |    u_type, u_tok, u_price FROM sc),
        |w AS (SELECT
        |    ${wAgree(MType, "u_type")} AS wa_type, ${wDis(MType, "u_type")} AS wd_type,
        |    ${wAgree(MTok, "u_tok")} AS wa_tok, ${wDis(MTok, "u_tok")} AS wd_tok,
        |    ${wAgree(MPrice, "u_price")} AS wa_price, ${wDis(MPrice, "u_price")} AS wd_price
        |  FROM sc2),
        |pairs AS (SELECT a.key AS key_a, b.key AS key_b,
        |    CASE WHEN a.ptype = b.ptype THEN 1 ELSE 0 END AS agr_type,
        |    CASE WHEN a.tok = b.tok THEN 1 ELSE 0 END AS agr_tok,
        |    CASE WHEN a.pbucket = b.pbucket THEN 1 ELSE 0 END AS agr_price
        |  FROM p a JOIN p b ON a.brand = b.brand AND a.size = b.size
        |    AND a.key < b.key)
        |SELECT key_a, key_b, CAST(agr_type AS BIGINT) AS agr_type,
        |  CAST(agr_tok AS BIGINT) AS agr_tok,
        |  CAST(agr_price AS BIGINT) AS agr_price,
        |  (CASE WHEN agr_type = 1 THEN w.wa_type ELSE -w.wd_type END
        |   + CASE WHEN agr_tok = 1 THEN w.wa_tok ELSE -w.wd_tok END
        |   + CASE WHEN agr_price = 1 THEN w.wa_price ELSE -w.wd_price END)
        |    AS score_microbits
        |FROM pairs, w
        |ORDER BY score_microbits DESC, key_a, key_b
        |LIMIT 50""".stripMargin
      }),

    // ---- q516: SAX symbolization of per-user activity series ----------------
    // Time-series motif discovery for behavior curation: each user's
    // four weekly event counts (PAA over days 1-28) symbolized
    // a/b/c/d by GLOBAL quartile breakpoints — exact order statistics
    // over the (user, week) count distribution, read from a
    // value-domain histogram cum (counts are small ints; no
    // single-partition row window). Users sharing a SAX word are
    // motif buckets — the coarse behavioral dedup that groups
    // "steady", "ramping", "bursty" users without any pair join.
    QueryDef("q516_sax_motifs",
      (s, d) => {
        val ev = events(s, d)
          .where(dayofmonth(col("ts")) <= 28)
          .select(col("user_id"),
            expr("CAST(day(ts) - 1 AS BIGINT) div 7").as("seg"))
        val users = ev.select("user_id").distinct()
        val grid = users.crossJoin(
          spark_explode_segs(ev.sparkSession))
        val cnt = ev.groupBy("user_id", "seg").agg(count(lit(1)).as("c"))
        val segs = grid.join(cnt, Seq("user_id", "seg"), "left")
          .select(col("user_id"), col("seg"),
            coalesce(col("c"), lit(0L)).as("c"))
        // global exact quartiles from the value-domain histogram
        val hist = segs.groupBy("c").agg(count(lit(1)).as("f"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("c").rowsBetween(Long.MinValue, 0)
        val cum = hist.select(col("c"), sum("f").over(w).as("cum"),
          sum("f").over(
            org.apache.spark.sql.expressions.Window.orderBy("c")
              .rowsBetween(Long.MinValue, Long.MaxValue)).as("m"))
        val bp = cum.agg(
          min(when(expr("cum * 4 >= m"), col("c"))).as("q1"),
          min(when(expr("cum * 2 >= m"), col("c"))).as("q2"),
          min(when(expr("cum * 4 >= 3 * m"), col("c"))).as("q3"))
        val sym = segs.crossJoin(broadcast(bp))
          .select(col("user_id"), col("seg"),
            when(col("c") <= col("q1"), "a")
              .when(col("c") <= col("q2"), "b")
              .when(col("c") <= col("q3"), "c")
              .otherwise("d").as("sym"))
        val words = sym.groupBy("user_id")
          .agg(concat_ws("", transform(
            array_sort(collect_list(struct(col("seg"), col("sym")))),
            e => e("sym"))).as("sax_word"))
        val sizes = words.groupBy("sax_word").agg(count(lit(1)).as("motif_size"))
        words.join(broadcast(sizes), Seq("sax_word"))
          .select(col("user_id"), col("sax_word"), col("motif_size"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id,
        |    (day(ts) - 1) // 7 AS seg FROM events WHERE day(ts) <= 28),
        |grid AS (SELECT user_id, seg
        |  FROM (SELECT DISTINCT user_id FROM ev),
        |    (SELECT unnest(generate_series(0, 3)) AS seg)),
        |cnt AS (SELECT user_id, seg, count(*) AS c FROM ev GROUP BY 1, 2),
        |segs AS (SELECT g.user_id, g.seg,
        |    CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
        |  FROM grid g LEFT JOIN cnt ON cnt.user_id = g.user_id
        |    AND cnt.seg = g.seg),
        |hist AS (SELECT c, count(*) AS f FROM segs GROUP BY 1),
        |cum AS (SELECT c, sum(f) OVER (ORDER BY c) AS cum,
        |    sum(f) OVER () AS m FROM hist),
        |bp AS (SELECT
        |    min(CASE WHEN cum * 4 >= m THEN c END) AS q1,
        |    min(CASE WHEN cum * 2 >= m THEN c END) AS q2,
        |    min(CASE WHEN cum * 4 >= 3 * m THEN c END) AS q3 FROM cum),
        |sym AS (SELECT s.user_id, s.seg,
        |    CASE WHEN s.c <= bp.q1 THEN 'a'
        |      WHEN s.c <= bp.q2 THEN 'b'
        |      WHEN s.c <= bp.q3 THEN 'c' ELSE 'd' END AS sym
        |  FROM segs s, bp),
        |words AS (SELECT user_id,
        |    string_agg(sym, '' ORDER BY seg) AS sax_word
        |  FROM sym GROUP BY 1)
        |SELECT w.user_id, w.sax_word,
        |  CAST(count(*) OVER (PARTITION BY w.sax_word) AS BIGINT)
        |    AS motif_size
        |FROM words w ORDER BY w.user_id""".stripMargin))
  )

  /** 4-row (seg 0..3) helper frame. */
  private def spark_explode_segs(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(0L, 1L, 2L, 3L).toDF("seg")
  }
}
