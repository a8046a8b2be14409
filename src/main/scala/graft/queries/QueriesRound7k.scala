package graft.queries

import graft.Tables._
import graft.ops.{Graph, Relational}
import org.apache.spark.sql.functions._

/** Round-7 eleventh batch: distribution/audit readouts a curation
  * pipeline runs before trusting its own data — Benford first-digit
  * divergence (synthetic/fraud detector), key-skew Gini (the shuffle
  * planner's input), leakage-free leave-one-out target encoding, the
  * exact-rational LSH banding S-curve planner, community modularity
  * (is the LPA partition any good), Theil–Sen robust trend, and a
  * histogram quantile sketch with measured error vs the exact
  * order statistic (completing the sketch-error family: HLL q268-style
  * / CMS q268 / MinHash q272 / quantiles here).
  */
object QueriesRound7k {

  // pinned signed floor division (x − pmod(x, m)) div m — the q242
  // discipline; Spark's div truncates toward zero and would split from
  // the oracle on negative numerators
  private def fdiv(a: String, m: String) =
    s"(($a) - pmod(($a), ($m))) div ($m)"
  private def duckFdiv(a: String, m: String) =
    s"(($a) - (((($a) % ($m)) + ($m)) % ($m))) // ($m)"

  val defs: Seq[QueryDef] = Seq(

    // ---- q326: Benford first-digit audit -------------------------------
    // Natural multiplicative data follows P(d) = log10(1 + 1/d);
    // synthetic or fabricated amounts don't — the divergence IS the
    // readout (this corpus's uniform-ish prices fail loudly, by
    // design). First digit via decimal-string head (exact on integer
    // cents), per-digit observed ppm vs the log table quantized ONCE
    // (floor(log10(1+1/d)·10⁶), same literals in both engines — the
    // q304 embedded-constant discipline). One map-side-combined agg to
    // the 9-row digit frame; the corpus total rides a broadcast.
    QueryDef("q326_benford_audit",
      (s, d) => {
        val exp = "CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091" +
          " WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181" +
          " WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152" +
          " ELSE 45757 END"
        val dig = orders(s, d)
          .select(expr("cast(cast(o_totalprice as decimal(18,2)) * 100" +
            " as bigint)").as("__c"))
          .select(expr("cast(substring(cast(__c as string), 1, 1)" +
            " as bigint)").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val tot = broadcast(dig.agg(sum("n").as("__t")))
        dig.crossJoin(tot)
          .select(col("digit"), col("n"),
            expr("(n * 1000000) div __t").as("obs_ppm"),
            expr(s"cast(($exp) as bigint)").as("exp_ppm"),
            expr(s"(n * 1000000) div __t - ($exp)").as("diff_ppm"))
          .orderBy("digit")
      },
      Some("""WITH dg AS (SELECT CAST(substr(CAST(
        |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(n) AS t FROM dg),
        |e AS (SELECT digit, n,
        |    CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
        |      ELSE 45757 END AS exp_ppm,
        |    CAST((n * 1000000) // t.t AS BIGINT) AS obs_ppm
        |  FROM dg, t)
        |SELECT digit, CAST(n AS BIGINT) AS n, obs_ppm,
        |  CAST(exp_ppm AS BIGINT) AS exp_ppm,
        |  obs_ppm - exp_ppm AS diff_ppm
        |FROM e ORDER BY digit""".stripMargin)),

    // ---- q327: key-skew Gini audit -------------------------------------
    // The number a shuffle planner wants BEFORE a big join: how
    // concentrated is the key distribution (Gini over per-key counts;
    // 0 = uniform, →1 = one hot key). Ranks over the O(keys) count
    // frame come from the q199 two-level machinery — NO
    // single-partition window of the key space — and the closed form
    // G = (2·Σi·cᵢ − (n+1)·S) / (n·S) on ascending ranks is exact
    // integer (sums in decimal(38,0): at 10⁹ keys Σi·cᵢ overflows
    // BIGINT long before it overflows 38 digits). Σi·cᵢ is invariant
    // under tie permutations (equal c), so the id tie-break never
    // shows in the answer. top1 share rides along.
    QueryDef("q327_key_skew_gini",
      (s, d) => {
        val cnts = lineitem(s, d)
          .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        val ranked = Relational.twoLevelRankDesc(
          cnts, "cnt", "l_partkey", idWidth = 4096L, outCol = "__rd")
        val tot = broadcast(cnts.agg(
          count(lit(1)).as("__n"), sum("cnt").as("__s"),
          max("cnt").as("__m")))
        ranked.crossJoin(tot)
          .select(expr("cast(__n + 1 - __rd as decimal(38,0)) * cnt")
            .as("__ic"), col("__n"), col("__s"), col("__m"))
          .groupBy("__n", "__s", "__m")
          .agg(sum("__ic").as("__sic"))
          .select(col("__n").as("n_keys"), col("__s").as("total_rows"),
            expr("cast((2 * __sic - cast((__n + 1) as decimal(38,0)) * __s)" +
              " * 1000000 div (cast(__n as decimal(38,0)) * __s) as bigint)")
              .as("gini_ppm"),
            expr("(__m * 1000000) div __s").as("top1_ppm"))
      },
      Some("""WITH c AS (SELECT l_partkey, count(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC,
        |    l_partkey) AS rd FROM c),
        |t AS (SELECT count(*) AS n, sum(cnt) AS s, max(cnt) AS m FROM c),
        |a AS (SELECT sum(CAST(t.n + 1 - r.rd AS HUGEINT) * r.cnt)
        |    AS sic FROM r, t)
        |SELECT CAST(t.n AS BIGINT) AS n_keys,
        |  CAST(t.s AS BIGINT) AS total_rows,
        |  CAST((2 * a.sic - CAST(t.n + 1 AS HUGEINT) * t.s) * 1000000
        |    // (CAST(t.n AS HUGEINT) * t.s) AS BIGINT) AS gini_ppm,
        |  CAST((t.m * 1000000) // t.s AS BIGINT) AS top1_ppm
        |FROM t, a""".stripMargin)),

    // ---- q328: leave-one-out target encoding ---------------------------
    // The leakage-free categorical encoder: a row's nation is encoded
    // by the urgency rate of the OTHER orders in its nation —
    // (Σy − y_own)·10⁶ div (n − 1) — so the row's own label never
    // leaks into its own feature (plain mean encoding fails exactly
    // there). Per-nation stats are one map-side-combined agg riding a
    // broadcast back onto the facts; numerator ≥ 0 by construction so
    // plain div is floor. Singleton nations encode null (honest, not
    // 0). Output trimmed to a deterministic slice to keep the dump
    // bounded.
    QueryDef("q328_loo_target_encode",
      (s, d) => {
        val o = orders(s, d)
          .join(customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"),
            col("c_nationkey").cast("long").as("nation"),
            when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L).as("y"))
        val st = o.groupBy("nation")
          .agg(sum("y").as("__sy"), count(lit(1)).as("__n"))
        o.join(broadcast(st), Seq("nation"))
          .where(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("nation"), col("y"),
            expr("CASE WHEN __n > 1 THEN ((__sy - y) * 1000000)" +
              " div (__n - 1) END").as("loo_ppm"))
          .orderBy("o_orderkey")
      },
      Some("""WITH o AS (SELECT o_orderkey, c.c_nationkey AS nation,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        |  FROM orders JOIN customer c ON o_custkey = c_custkey),
        |st AS (SELECT nation, sum(y) AS sy, count(*) AS n
        |  FROM o GROUP BY 1)
        |SELECT o.o_orderkey, CAST(o.nation AS BIGINT) AS nation,
        |  CAST(o.y AS BIGINT) AS y,
        |  CASE WHEN st.n > 1 THEN CAST(((st.sy - o.y) * 1000000)
        |    // (st.n - 1) AS BIGINT) END AS loo_ppm
        |FROM o JOIN st USING (nation) WHERE o.o_orderkey % 5 = 0
        |ORDER BY o.o_orderkey""".stripMargin)),

    // ---- q329: LSH banding S-curve planner -----------------------------
    // The table you read BEFORE picking q91's (bands, rows): candidate
    // probability P = 1 − (1 − s^r)^b for a K = 24 signature across
    // (b,r) ∈ {(24,1),(12,2),(6,4),(3,8)} at s = k/10 — EXACT RATIONAL
    // arithmetic, no pow(): with s = k/10, (1−s^r)^b =
    // (10^r − k^r)^b / 10^24, and b = 3·2^m makes the numerator one
    // cube + m squarings of integers bounded by 10²⁴ (decimal(38,0) /
    // HUGEINT — CASE branches evaluate lazily in both engines, so the
    // wide-base rows never touch the deep-power branches). P_ppm =
    // 10⁶ − N div 10¹⁸. A pure planner — no corpus scan; the grid is
    // 36 rows.
    QueryDef("q329_lsh_scurve",
      (s, d) => {
        import s.implicits._
        val cfg = Seq((24L, 1L, 3L), (12L, 2L, 2L), (6L, 4L, 1L),
          (3L, 8L, 0L)).toDF("b", "r", "__m")
        // __m counts SQUARINGS BEFORE the cube: N = (base^(2^m))^3 —
        // exponent 3·2^m = b; pre-cube squaring keeps every
        // intermediate ≤ 10^8·2^m ≤ 10^24 (post-cube squaring would
        // pass through base^6 = 10^48 for r = 8)
        val kr = "CASE r WHEN 1 THEN k WHEN 2 THEN k*k" +
          " WHEN 4 THEN (k*k)*(k*k) ELSE ((k*k)*(k*k))*((k*k)*(k*k)) END"
        val p10r = "CASE r WHEN 1 THEN 10 WHEN 2 THEN 100" +
          " WHEN 4 THEN 10000 ELSE 100000000 END"
        cfg.crossJoin(s.range(1, 10).select(col("id").as("k")))
          .withColumn("__base",
            expr(s"cast(($p10r) - ($kr) as decimal(38,0))"))
          .withColumn("__p", expr("CASE __m WHEN 0 THEN __base" +
            " WHEN 1 THEN __base*__base" +
            " WHEN 2 THEN (__base*__base)*(__base*__base)" +
            " ELSE ((__base*__base)*(__base*__base))" +
            "*((__base*__base)*(__base*__base)) END"))
          .withColumn("__n", expr("(__p*__p)*__p"))
          .select(col("b"), col("r"), col("k"),
            expr("1000000L - (__n div cast(1000000000000000000" +
              " as decimal(38,0)))").as("p_ppm"))
          .orderBy(col("b").desc, col("k"))
      },
      Some("""WITH cfg(b, r, m) AS (VALUES (24, 1, 3), (12, 2, 2),
        |    (6, 4, 1), (3, 8, 0)),
        |g AS (SELECT b, r, m, unnest(generate_series(1, 9)) AS k
        |  FROM cfg),
        |bs AS (SELECT b, r, m, k, CAST(
        |    (CASE r WHEN 1 THEN 10 WHEN 2 THEN 100 WHEN 4 THEN 10000
        |      ELSE 100000000 END)
        |    - (CASE r WHEN 1 THEN k WHEN 2 THEN k*k
        |      WHEN 4 THEN (k*k)*(k*k)
        |      ELSE ((k*k)*(k*k))*((k*k)*(k*k)) END) AS HUGEINT) AS base
        |  FROM g),
        |p AS (SELECT b, r, k, CASE m WHEN 0 THEN base
        |    WHEN 1 THEN base*base
        |    WHEN 2 THEN (base*base)*(base*base)
        |    ELSE ((base*base)*(base*base))*((base*base)*(base*base))
        |    END AS pw FROM bs),
        |n AS (SELECT b, r, k, (pw*pw)*pw AS nm FROM p)
        |SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
        |  CAST(k AS BIGINT) AS k,
        |  CAST(1000000 - nm // CAST('1000000000000000000' AS HUGEINT)
        |    AS BIGINT) AS p_ppm
        |FROM n ORDER BY b DESC, k""".stripMargin)),

    // ---- q330: community modularity ------------------------------------
    // Is q229's LPA partition structure or noise? Newman modularity
    // Q = Σ_c [e_c/E − (d_c/E)²] over the same co-purchase graph and
    // the same 2-round labels (directed-symmetric convention: E =
    // directed edges, e_c = intra-community directed edges, d_c =
    // degree mass) — Q_ppm = (E·Σe_c − Σd_c²)·10⁶ fdiv E², sums in
    // decimal(38,0) (d_c² reaches E² at one giant community), signed
    // floor division because Q < 0 is a real answer (worse than
    // random). Two label joins onto the once-laid-out edge frame +
    // O(communities) folds; the oracle replays the LPA rounds as
    // chained CTEs (q229's discipline) and then the formula.
    QueryDef("q330_modularity",
      (s, d) => {
        val li = lineitem(s, d).where(col("l_orderkey") % 7 === 0)
          .select("l_orderkey", "l_partkey")
        val dd = li.withColumnRenamed("l_partkey", "src")
          .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
          .where(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
        val labels = Graph.labelPropagation(
          dd.where(col("src") < col("dst")), "src", "dst", rounds = 2)
        val lsrc = labels.select(col("id").as("src"),
          col("label").as("__ls"))
        val ldst = labels.select(col("id").as("dst"),
          col("label").as("__ld"))
        val e = dd.join(lsrc, Seq("src")).join(ldst, Seq("dst"))
        val perC = e.groupBy(col("__ls").as("__c"))
          .agg(count(lit(1)).as("__d"),
            sum(when(col("__ls") === col("__ld"), 1L).otherwise(0L))
              .as("__e"))
        val tot = perC.agg(
          count(lit(1)).as("n_communities"),
          sum("__d").as("__E"),
          sum(expr("cast(__e as decimal(38,0))")).as("__se"),
          sum(expr("cast(__d as decimal(38,0)) * __d")).as("__sd2"))
        tot.select(col("n_communities"), col("__E").as("e_directed"),
          expr("cast(" + fdiv(
            "(cast(__E as decimal(38,0)) * __se - __sd2) * 1000000",
            "cast(__E as decimal(38,0)) * __E") + " as bigint)")
            .as("q_ppm"))
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
        |  FROM l1 LEFT JOIN b2 USING (id)),
        |e AS (SELECT ls.label AS ls, ld.label AS ld FROM d
        |  JOIN l2 ls ON ls.id = d.src JOIN l2 ld ON ld.id = d.dst),
        |pc AS (SELECT ls AS c, count(*) AS dg,
        |    sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS ei
        |  FROM e GROUP BY 1),
        |t AS (SELECT count(*) AS nc, sum(dg) AS E,
        |    sum(CAST(ei AS HUGEINT)) AS se,
        |    sum(CAST(dg AS HUGEINT) * dg) AS sd2 FROM pc)
        |SELECT CAST(nc AS BIGINT) AS n_communities,
        |  CAST(E AS BIGINT) AS e_directed,
        |  CAST(""".stripMargin +
        duckFdiv("(CAST(E AS HUGEINT) * se - sd2) * 1000000",
          "CAST(E AS HUGEINT) * E") +
        """ AS BIGINT) AS q_ppm
        |FROM t""".stripMargin)),

    // ---- q331: Theil–Sen robust trend ----------------------------------
    // The slope a few outlier hours can't drag: median over all
    // pairwise slopes of the hourly event-count series, restricted to
    // the trailing 168-hour window (Theil–Sen is inherently O(w²) in
    // the WINDOW — bounded forever — never in the corpus; the hourly
    // frame itself is one map-side-combined agg). Slopes in signed
    // floor micro (the fdiv discipline); lower median by order
    // statistic over the ≤ 14k-pair bounded frame. The i<j pair join
    // is a broadcast nested loop of a 168-row frame — a bounded probe,
    // not a data cross join.
    QueryDef("q331_theil_sen",
      (s, d) => {
        val h = events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy("h").agg(count(lit(1)).as("c"))
        val mx = broadcast(h.agg(max("h").as("__mh")))
        val hw = h.crossJoin(mx).where(col("h") > col("__mh") - 168)
          .select("h", "c")
        val pairs = hw.select(col("h").as("__h1"), col("c").as("__c1"))
          .join(hw.select(col("h").as("__h2"), col("c").as("__c2")),
            col("__h1") < col("__h2"))
          .select(expr(fdiv("(__c2 - __c1) * 1000000", "__h2 - __h1"))
            .as("__sl"))
        val np = broadcast(pairs.agg(count(lit(1)).as("__np")))
        val ranked = pairs.withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("__sl")))
        ranked.crossJoin(np)
          .where(col("__rn") === expr("(__np + 1) div 2"))
          .crossJoin(broadcast(hw.agg(count(lit(1)).as("n_hours"))))
          .select(col("n_hours"), col("__np").as("n_pairs"),
            col("__sl").as("slope_micro_median"))
      },
      Some("""WITH h AS (SELECT epoch_us(ts) // 3600000000 AS h,
        |    count(*) AS c FROM events GROUP BY 1),
        |hw AS (SELECT h, c FROM h
        |  WHERE h > (SELECT max(h) FROM h) - 168),
        |p AS (SELECT """.stripMargin +
        duckFdiv("(b.c - a.c) * 1000000", "b.h - a.h") +
        """ AS sl
        |  FROM hw a JOIN hw b ON a.h < b.h),
        |r AS (SELECT sl, row_number() OVER (ORDER BY sl) AS rn FROM p),
        |np AS (SELECT count(*) AS np FROM p)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM hw) AS n_hours,
        |  CAST(np.np AS BIGINT) AS n_pairs,
        |  CAST(r.sl AS BIGINT) AS slope_micro_median
        |FROM r, np WHERE r.rn = (np.np + 1) // 2""".stripMargin)),

    // ---- q332: histogram quantile sketch, measured error ---------------
    // The mergeable 256-bin equal-width histogram every engine keeps
    // in stats, EVALUATED: estimate P50/P90/P99 of price cents as the
    // upper edge of the first bin whose cumulative count reaches the
    // target position, against the EXACT order statistic (value-domain
    // histogram + q199 twoLevelCumSum — no single-partition window of
    // the value space; the 256-bin cum is a window over the bounded
    // bin frame). Positions use the percentile_disc convention
    // ⌈p·n/100⌉. err_ppm = |est − exact|·10⁶ div exact — the
    // measured-error discipline (q262/q268/q272), both sides
    // hash-verified. The sketch over-estimates by ≤ one bin width by
    // construction (est ≥ exact always; spec-pinned).
    QueryDef("q332_quantile_sketch_error",
      (s, d) => {
        val v = lineitem(s, d)
          .select(expr("cast(cast(l_extendedprice as decimal(18,2))" +
            " * 100 as bigint)").as("v"))
        val st = broadcast(v.agg(min("v").as("__mn"), max("v").as("__mx"),
          count(lit(1)).as("__n")))
        val targets = broadcast(s.range(0, 3).select(
          expr("element_at(array(50L, 90L, 99L), cast(id + 1 as int))")
            .as("p")).crossJoin(st)
          .select(col("p"), col("__mn"), col("__mx"),
            expr("(p * __n + 99) div 100").as("__pos")))
        val hist = v.groupBy("v").agg(count(lit(1)).as("__c"))
        val cum = Relational.twoLevelCumSum(hist, "v", "__c", 4096L)
        val exact = cum.join(targets.select("p", "__pos"),
            col("cum") >= col("__pos"))
          .groupBy("p").agg(min("v").as("exact_v"))
        val bins = v.crossJoin(st)
          .select(expr("((v - __mn) * 256) div (__mx - __mn + 1)")
            .as("__b"))
          .groupBy("__b").agg(count(lit(1)).as("__c"))
        val wB = org.apache.spark.sql.expressions.Window.orderBy("__b")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val bcum = bins.withColumn("__cum", sum("__c").over(wB))
        val est = bcum.join(targets, col("__cum") >= col("__pos"))
          .groupBy("p", "__mn", "__mx").agg(min("__b").as("__eb"))
          .select(col("p"),
            expr("__mn + ((__eb + 1) * (__mx - __mn + 1)) div 256 - 1")
              .as("est_v"))
        exact.join(est, Seq("p"))
          .select(col("p"), col("exact_v"), col("est_v"),
            abs(col("est_v") - col("exact_v")).as("abs_err"),
            expr("(abs(est_v - exact_v) * 1000000) div exact_v")
              .as("err_ppm"))
          .orderBy("p")
      },
      Some("""WITH v AS (SELECT CAST(CAST(l_extendedprice AS
        |      DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM lineitem),
        |st AS (SELECT min(v) AS mn, max(v) AS mx, count(*) AS n FROM v),
        |tg AS (SELECT p, (p * st.n + 99) // 100 AS pos, st.mn, st.mx
        |  FROM (SELECT unnest([50, 90, 99]) AS p), st),
        |h AS (SELECT v, count(*) AS c FROM v GROUP BY 1),
        |cm AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        |ex AS (SELECT tg.p, min(cm.v) AS exact_v FROM cm
        |  JOIN tg ON cm.cum >= tg.pos GROUP BY 1),
        |b AS (SELECT ((v.v - st.mn) * 256) // (st.mx - st.mn + 1) AS b,
        |    count(*) AS c FROM v, st GROUP BY 1),
        |bc AS (SELECT b, sum(c) OVER (ORDER BY b) AS cum FROM b),
        |es AS (SELECT tg.p, tg.mn, tg.mx, min(bc.b) AS eb FROM bc
        |  JOIN tg ON bc.cum >= tg.pos GROUP BY 1, 2, 3),
        |e2 AS (SELECT p,
        |    mn + ((eb + 1) * (mx - mn + 1)) // 256 - 1 AS est_v
        |  FROM es)
        |SELECT CAST(ex.p AS BIGINT) AS p,
        |  CAST(ex.exact_v AS BIGINT) AS exact_v,
        |  CAST(e2.est_v AS BIGINT) AS est_v,
        |  CAST(abs(e2.est_v - ex.exact_v) AS BIGINT) AS abs_err,
        |  CAST((abs(e2.est_v - ex.exact_v) * 1000000) // ex.exact_v
        |    AS BIGINT) AS err_ppm
        |FROM ex JOIN e2 USING (p) ORDER BY p""".stripMargin)))
}
