package graft.queries

import graft.Tables._
import graft.ops.{Relational, Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-7 eighteenth batch: winsorization at exact quantile
  * thresholds, the Simpson's-paradox reversal detector, positional
  * proximity search, and the order-independent table fingerprint
  * (pipeline-stage equality at checksum cost).
  */
object QueriesRound7r {

  val defs: Seq[QueryDef] = Seq(

    // ---- q357: winsorization at exact P1/P99 ---------------------------
    // Robust preprocessing with no floats and no approx_percentile:
    // clip thresholds are the EXACT order statistics at ⌈n/100⌉ and
    // ⌈99n/100⌉ from the value-domain histogram cum (twoLevelCumSum —
    // the q332 lookup), clipping is one broadcast-joined map, and the
    // readout is clipped-row counts plus exact means in cents before
    // and after — the outlier-taming step a revenue model runs first.
    QueryDef("q357_winsorize",
      (s, d) => {
        val v = lineitem(s, d)
          .select(expr("cast(cast(l_extendedprice as decimal(18,2))" +
            " * 100 as bigint)").as("v"))
        val hist = v.groupBy("v").agg(count(lit(1)).as("__c"))
        val cum = Relational.twoLevelCumSum(hist, "v", "__c", 4096L)
        val n = broadcast(v.agg(count(lit(1)).as("__n")))
        val targets = broadcast(s.range(0, 2)
          .select(expr("element_at(array(1L, 99L), cast(id + 1 as int))")
            .as("__p")).crossJoin(n)
          .select(col("__p"), expr("(__p * __n + 99) div 100").as("__pos")))
        val thr = broadcast(cum.join(targets, col("cum") >= col("__pos"))
          .groupBy("__p").agg(min("v").as("__tv"))
          .agg(min(when(col("__p") === 1, col("__tv"))).as("__lo"),
            max(when(col("__p") === 99, col("__tv"))).as("__hi")))
        v.crossJoin(thr)
          .select(col("v"), col("__lo"), col("__hi"),
            expr("greatest(__lo, least(__hi, v))").as("__w"))
          .agg(count(lit(1)).as("n_rows"),
            max("__lo").as("p1_cents"), max("__hi").as("p99_cents"),
            sum(when(col("v") < col("__lo"), 1L).otherwise(0L))
              .as("n_clipped_lo"),
            sum(when(col("v") > col("__hi"), 1L).otherwise(0L))
              .as("n_clipped_hi"),
            expr("sum(v) div count(1)").as("mean_before_cents"),
            expr("sum(__w) div count(1)").as("mean_after_cents"))
      },
      Some("""WITH v AS (SELECT CAST(CAST(l_extendedprice AS
        |      DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM lineitem),
        |h AS (SELECT v, count(*) AS c FROM v GROUP BY 1),
        |cm AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM v),
        |tg AS (SELECT p, (p * n.n + 99) // 100 AS pos
        |  FROM (SELECT unnest([1, 99]) AS p), n),
        |t2 AS (SELECT
        |    min(CASE WHEN p = 1 THEN mv END) AS lo,
        |    max(CASE WHEN p = 99 THEN mv END) AS hi
        |  FROM (SELECT tg.p AS p, min(cm.v) AS mv FROM cm
        |    JOIN tg ON cm.cum >= tg.pos GROUP BY 1))
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(max(t2.lo) AS BIGINT) AS p1_cents,
        |  CAST(max(t2.hi) AS BIGINT) AS p99_cents,
        |  CAST(sum(CASE WHEN v.v < t2.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_lo,
        |  CAST(sum(CASE WHEN v.v > t2.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_hi,
        |  CAST(sum(v.v) // count(*) AS BIGINT) AS mean_before_cents,
        |  CAST(sum(greatest(t2.lo, least(t2.hi, v.v))) // count(*)
        |    AS BIGINT) AS mean_after_cents
        |FROM v, t2""".stripMargin)),

    // ---- q358: Simpson's-paradox reversal detector ---------------------
    // The aggregation trap, audited: per-nation covariance SIGN of
    // (price, urgency) vs the pooled sign — sign(n·Σxy − Σx·Σy) is
    // exact in cross-multiplied decimal(38,0) lanes, so the detector
    // never misreads a near-zero covariance through float noise. A
    // reversal (group signs uniformly against the pooled sign) is
    // the classic paradox; per-group rows report the evidence.
    QueryDef("q358_simpsons_paradox",
      (s, d) => {
        val o = orders(s, d)
          .join(customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nation"),
            expr("cast(cast(o_totalprice as decimal(18,2)) * 100" +
              " as bigint)").as("x"),
            when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L).as("y"))
        def cov = "(cast(__n as decimal(38,0)) * __sxy" +
          " - cast(__sx as decimal(38,0)) * __sy)"
        val per = o.groupBy("nation")
          .agg(count(lit(1)).as("__n"), sum("x").as("__sx"),
            sum("y").as("__sy"), sum(expr("x * y")).as("__sxy"))
          .select(col("nation"), col("__n").as("n_orders"),
            expr(s"cast(sign($cov) as bigint)").as("cov_sign"))
        val pooled = broadcast(o
          .agg(count(lit(1)).as("__n"), sum("x").as("__sx"),
            sum("y").as("__sy"), sum(expr("x * y")).as("__sxy"))
          .select(expr(s"cast(sign($cov) as bigint)")
            .as("pooled_sign")))
        per.crossJoin(pooled)
          .select(col("nation"), col("n_orders"), col("cov_sign"),
            col("pooled_sign"),
            (col("cov_sign") =!= lit(0L) &&
              col("cov_sign") === -col("pooled_sign")).as("reversed"))
          .orderBy("nation")
      },
      Some("""WITH o AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS x,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        |  FROM orders JOIN customer c ON o_custkey = c_custkey),
        |g AS (SELECT nation, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy FROM o GROUP BY 1),
        |p AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy FROM o)
        |SELECT g.nation, CAST(g.n AS BIGINT) AS n_orders,
        |  CAST(sign(CAST(g.n AS HUGEINT) * g.sxy
        |    - CAST(g.sx AS HUGEINT) * g.sy) AS BIGINT) AS cov_sign,
        |  CAST(sign(CAST(p.n AS HUGEINT) * p.sxy
        |    - CAST(p.sx AS HUGEINT) * p.sy) AS BIGINT) AS pooled_sign,
        |  (sign(CAST(g.n AS HUGEINT) * g.sxy
        |      - CAST(g.sx AS HUGEINT) * g.sy) <> 0
        |    AND sign(CAST(g.n AS HUGEINT) * g.sxy
        |      - CAST(g.sx AS HUGEINT) * g.sy)
        |      = -sign(CAST(p.n AS HUGEINT) * p.sxy
        |        - CAST(p.sx AS HUGEINT) * p.sy)) AS reversed
        |FROM g, p ORDER BY g.nation""".stripMargin)),

    // ---- q359: positional proximity search -----------------------------
    // Between q257's exact phrase and q335's Boolean AND sits
    // proximity ranking: docs containing both terms, scored by the
    // MINIMUM token span between any occurrence pair. Posting streams
    // are term-filtered BEFORE the shuffle (two posting lists, not
    // the corpus); the per-doc pair join is bounded by tf_a·tf_b.
    // score = 10⁶ div (1 + min_span) — adjacent terms score highest.
    QueryDef("q359_proximity_search",
      (s, d) => {
        val post = documents(s, d)
          .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            col("col").as("tok"))
          .where(col("tok").isin("join", "hash"))
        def side(t: String, p: String) = post.where(col("tok") === t)
          .select(col("doc_id"), col("pos").as(p))
        side("join", "__pa").join(side("hash", "__pb"), Seq("doc_id"))
          .groupBy("doc_id")
          .agg(countDistinct("__pa").as("tf_join"),
            countDistinct("__pb").as("tf_hash"),
            min(abs(col("__pa") - col("__pb"))).as("min_span"))
          .select(col("doc_id"), col("tf_join"), col("tf_hash"),
            col("min_span"),
            expr("1000000L div (1 + min_span)").as("prox_micro"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest(${DuckSql.toks("text")})
        |      AS tok, generate_subscripts(${DuckSql.toks("text")}, 1) - 1
        |      AS pos
        |  FROM documents),
        |p AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok FROM t
        |  WHERE tok IN ('join', 'hash')),
        |j AS (SELECT a.doc_id,
        |    count(DISTINCT a.pos) AS tf_join,
        |    count(DISTINCT b.pos) AS tf_hash,
        |    min(abs(a.pos - b.pos)) AS min_span
        |  FROM p a JOIN p b ON a.doc_id = b.doc_id
        |    AND a.tok = 'join' AND b.tok = 'hash'
        |  GROUP BY 1)
        |SELECT doc_id, CAST(tf_join AS BIGINT) AS tf_join,
        |  CAST(tf_hash AS BIGINT) AS tf_hash,
        |  CAST(min_span AS BIGINT) AS min_span,
        |  CAST(1000000 // (1 + min_span) AS BIGINT) AS prox_micro
        |FROM j ORDER BY doc_id""".stripMargin)),

    // ---- q360: order-independent table fingerprint ---------------------
    // Pipeline-stage equality at checksum cost: per-row 32-bit hash
    // of the canonical column serialization, folded with bit_xor and
    // a decimal sum — both order-independent, so ANY partitioning,
    // shuffle, or rewrite of the same rows fingerprints identically,
    // and q345's planted-drift generation does not (spec pins both).
    // The cheap "did this stage change the data" gate between
    // pipeline hops — no row-by-row diff until fingerprints disagree.
    QueryDef("q360_table_fingerprint",
      (s, d) => {
        val v1 = documents(s, d)
        val v2 = v1.select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null).cast("string"))
            .otherwise(col("lang")).as("lang"),
          col("source"), col("n_chars"))
        def fp(df: org.apache.spark.sql.DataFrame, name: String) =
          df.select(Sampling.hashLong(concat_ws("|",
              col("doc_id").cast("string"),
              coalesce(col("lang"), lit(" ")),
              col("source"), col("n_chars").cast("string")))
            .as("__h"))
            .agg(count(lit(1)).as("n_rows"),
              expr("bit_xor(__h)").as("fp_xor"),
              expr("cast(sum(cast(__h as decimal(38,0))) as string)")
                .as("fp_sum"))
            .select(lit(name).as("artifact"), col("n_rows"),
              col("fp_xor"), col("fp_sum"))
        fp(v1, "v1")
          .unionByName(fp(v1.orderBy(col("n_chars").desc), "v1_reordered"))
          .unionByName(fp(v2, "v2_drifted"))
          .orderBy("artifact")
      },
      Some {
        val h = DuckSql.hashLong(
          "CAST(doc_id AS VARCHAR) || '|' || coalesce(lang, ' ')" +
            " || '|' || source || '|' || CAST(n_chars AS VARCHAR)")
        def one(src: String, name: String) =
          s"""SELECT '$name' AS artifact,
          |  CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(bit_xor($h) AS BIGINT) AS fp_xor,
          |  CAST(CAST(sum($h) AS HUGEINT) AS VARCHAR) AS fp_sum
          |FROM $src"""
        s"""WITH v2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
        |    source, n_chars FROM documents)
        |SELECT * FROM (
        |  ${one("documents", "v1")}
        |  UNION ALL ${one("documents", "v1_reordered")}
        |  UNION ALL ${one("v2", "v2_drifted")}
        |) ORDER BY artifact""".stripMargin
      }))
}
