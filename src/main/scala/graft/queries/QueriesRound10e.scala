package graft.queries

import graft.Tables._
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Round-10 fifth batch: index maintenance under compaction (Bloom
  * merge law q559), the CBO's other two food groups — histogram range
  * selectivity (q560) and join-cardinality estimation (q561) — and
  * the word2vec-style c^(3/4) negative-sampling table (q562).
  */
object QueriesRound10e {

  val defs: Seq[QueryDef] = Seq(

    // ---- q559: Bloom merge law under compaction -----------------------------------
    // When the q538 compactor merges segments, the q551 point-lookup
    // index must follow WITHOUT rescanning: a Bloom filter is a
    // bitwise OR-fold, so bloom(A ∪ B) == bloom(A) | bloom(B) — the
    // mergeable-sketch property (the KMV/HLL merge-law discipline, now
    // for the file index). Proven in-query at full bit granularity:
    // per-bit presence sets for two key-segments and their union are
    // built independently, and the law's violation count rides the
    // output pinned to ZERO (compared bit-by-bit, not just counted).
    QueryDef("q559_bloom_merge_law",
      (s, d) => {
        val o = orders(s, d).select(col("o_orderkey").as("okey"),
          (col("o_orderkey") % 2).as("half"))
        def positions(key: org.apache.spark.sql.Column) = array(
          (0 until 7).map(i => (Sampling.hashLong(
            concat_ws("#", key, lit(i))) % 16384).as(s"p$i")): _*)
        // per-half bit sets, built independently
        val bits = o.select(col("half"), explode(positions(col("okey")))
          .as("pos")).distinct()
        val a = bits.where(col("half") === 0).select(col("pos").as("pa"))
        val b = bits.where(col("half") === 1).select(col("pos").as("pb"))
        // the union's bit set, built from scratch over ALL keys
        val u = o.select(explode(positions(col("okey"))).as("pu")).distinct()
        val orFold = a.select(col("pa").as("pos"))
          .unionAll(b.select(col("pb").as("pos"))).distinct()
        // law: orFold == u, checked both directions via anti joins
        val missing = u.join(orFold, u("pu") === orFold("pos"), "left_anti")
          .agg(count(lit(1)).as("or_missing"))
        val extra = orFold.join(u, orFold("pos") === u("pu"), "left_anti")
          .agg(count(lit(1)).as("or_extra"))
        a.agg(count(lit(1)).as("bits_a"))
          .crossJoin(b.agg(count(lit(1)).as("bits_b")))
          .crossJoin(u.agg(count(lit(1)).as("bits_union")))
          .crossJoin(missing).crossJoin(extra)
      },
      Some {
        def pos(key: String) = (0 until 7).map { i =>
          s"SELECT ${DuckSql.hashLong(
            s"CAST($key AS VARCHAR) || '#' || CAST($i AS VARCHAR)")} % 16384" +
            s" AS pos, o_orderkey % 2 AS half FROM orders"
        }.mkString(" UNION ALL ")
        s"""WITH allpos AS (${pos("o_orderkey")}),
        |a AS (SELECT DISTINCT pos FROM allpos WHERE half = 0),
        |b AS (SELECT DISTINCT pos FROM allpos WHERE half = 1),
        |u AS (SELECT DISTINCT pos FROM allpos),
        |orf AS (SELECT pos FROM a UNION SELECT pos FROM b)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS bits_a,
        |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS bits_b,
        |  (SELECT CAST(count(*) AS BIGINT) FROM u) AS bits_union,
        |  (SELECT CAST(count(*) AS BIGINT) FROM u
        |     WHERE pos NOT IN (SELECT pos FROM orf)) AS or_missing,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orf
        |     WHERE pos NOT IN (SELECT pos FROM u)) AS or_extra""".stripMargin
      }),

    // ---- q560: histogram range-selectivity estimation -------------------------------
    // The q549 rule prices EQUALITY predicates with NDVs; RANGE
    // predicates need histograms. Per-cent-bucket counts of
    // o_totalprice (value-domain: ≤ ~600 distinct 10-dollar buckets)
    // give the estimator; the lane prices three range predicates by
    // summing bucket overlap with LINEAR INTERPOLATION on the two edge
    // buckets (the Selinger/ANALYZE play, integer form: contribution =
    // n_b·overlap_width div bucket_width), then rides the TRUE count
    // and the signed error in ppm beside each estimate. Everything is
    // one scan + value-domain arithmetic, both engines identical.
    QueryDef("q560_histogram_selectivity",
      (s, d) => {
        val o = orders(s, d).select(
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100000")
            .as("b"), // $1000-wide buckets
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        val hist = o.groupBy("b").agg(count(lit(1)).as("nb"))
        // predicates in cents: [lo, hi)
        val preds = Seq(
          ("p1", 5000000L, 15000000L), // $50k-150k
          ("p2", 10050000L, 10175000L), // mid-bucket edges: interpolation visible
          ("p3", 0L, 30000000L)) // wide
        val estRows = preds.map { case (name, lo, hi) =>
          hist.agg(sum(expr(
            // overlap of bucket [b*1e5, (b+1)*1e5) with [lo, hi)
            s"nb * greatest(0L, least((b + 1) * 100000, ${hi}L)" +
              s" - greatest(b * 100000, ${lo}L)) div 100000")).as("est"))
            .crossJoin(o.agg(sum(
              (col("cents") >= lo && col("cents") < hi).cast("long"))
              .as("true_n")))
            .select(lit(name).as("pred"), col("est"), col("true_n"),
              expr("CAST(signum(est - true_n) AS BIGINT)" +
                " * (abs(est - true_n) * 1000000" +
                " div greatest(true_n, 1L))").as("err_ppm"))
        }
        estRows.reduce(_ unionAll _).orderBy("pred")
      },
      Some {
        def one(name: String, lo: Long, hi: Long) =
          s"""SELECT '$name' AS pred,
             |  (SELECT CAST(sum(nb * greatest(0, least((b + 1) * 100000, $hi)
             |      - greatest(b * 100000, $lo)) // 100000) AS BIGINT)
             |    FROM hist) AS est,
             |  (SELECT CAST(sum(CASE WHEN cents >= $lo AND cents < $hi
             |      THEN 1 ELSE 0 END) AS BIGINT) FROM o) AS true_n""".stripMargin
        s"""WITH o AS (SELECT
        |    CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS b,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |hist AS (SELECT b, CAST(count(*) AS BIGINT) AS nb FROM o
        |  GROUP BY 1),
        |r AS (${one("p1", 5000000L, 15000000L)}
        |  UNION ALL ${one("p2", 10050000L, 10175000L)}
        |  UNION ALL ${one("p3", 0L, 30000000L)})
        |SELECT pred, est, true_n,
        |  CAST(sign(est - true_n) AS BIGINT)
        |    * (abs(est - true_n) * 1000000 // greatest(true_n, 1))
        |    AS err_ppm
        |FROM r ORDER BY pred""".stripMargin
      }),

    // ---- q561: join-cardinality estimation --------------------------------------------
    // The Selinger formula |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) —
    // what the q549 rule would use to price the JOIN OUTPUT (not just
    // the build side) before committing to a plan. Estimated vs true
    // for three joins of different key quality (PK-FK, skewed
    // low-cardinality, synthetic mod-key), signed error in ppm. At
    // 100 TB this estimate decides join ORDER; measuring its error on
    // real keys is how a CBO earns trust.
    QueryDef("q561_join_cardinality",
      (s, d) => {
        // the TRUE cardinality is computed as Σ_k cntA(k)·cntB(k) over
        // the two group-count tables — exact, and O(distinct keys)
        // instead of materializing the join (the skewed lane's true
        // output is ~10¹⁰ rows; counting it by executing the join
        // would be the exact mistake the estimator exists to prevent)
        def lane(name: String, a: org.apache.spark.sql.DataFrame,
                 b: org.apache.spark.sql.DataFrame) = {
          val ga = a.groupBy("k").agg(count(lit(1)).as("ca"))
          val gb = b.groupBy("k").agg(count(lit(1)).as("cb"))
          val trueN = ga.join(gb, Seq("k"))
            .agg(coalesce(sum(expr("ca * cb")), lit(0L)).as("true_n"))
          a.agg(count(lit(1)).as("na"), countDistinct(col("k")).as("ndva"))
            .crossJoin(b.agg(count(lit(1)).as("nb"),
              countDistinct(col("k")).as("ndvb")))
            .crossJoin(trueN)
            .select(lit(name).as("join_key"),
              expr("na * nb div greatest(ndva, ndvb)").as("est"),
              col("true_n"),
              expr("CAST(signum(na * nb div greatest(ndva, ndvb) - true_n)" +
                " AS BIGINT) * (abs(na * nb div greatest(ndva, ndvb)" +
                " - true_n) * 1000000 div greatest(true_n, 1L))")
                .as("err_ppm"))
        }
        val o = orders(s, d)
        val c = customer(s, d)
        val l = lineitem(s, d)
        lane("pk_fk", o.select(col("o_custkey").as("k")),
          c.select(col("c_custkey").as("k")))
          .unionAll(lane("skewed", l.select(col("l_linestatus").as("k")),
            o.select(col("o_orderstatus").as("k"))))
          .unionAll(lane("mod_key",
            o.select((col("o_orderkey") % 97).cast("string").as("k")),
            c.select((col("c_custkey") % 97).cast("string").as("k"))))
          .orderBy("join_key")
      },
      Some {
        def lane(name: String) =
          s"""SELECT '$name' AS join_key,
             |  (SELECT CAST(count(*) AS BIGINT) FROM a_$name)
             |    * (SELECT CAST(count(*) AS BIGINT) FROM b_$name)
             |    // greatest(
             |      (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM a_$name),
             |      (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM b_$name))
             |    AS est,
             |  coalesce((SELECT CAST(sum(ca * cb) AS BIGINT) FROM
             |    (SELECT k, CAST(count(*) AS BIGINT) AS ca FROM a_$name
             |       GROUP BY 1) ga
             |    JOIN (SELECT k, CAST(count(*) AS BIGINT) AS cb FROM b_$name
             |       GROUP BY 1) gb USING (k)), 0) AS true_n""".stripMargin
        s"""WITH a_pk_fk AS (SELECT o_custkey AS k FROM orders),
        |b_pk_fk AS (SELECT c_custkey AS k FROM customer),
        |a_skewed AS (SELECT l_linestatus AS k FROM lineitem),
        |b_skewed AS (SELECT o_orderstatus AS k FROM orders),
        |a_mod_key AS (SELECT CAST(o_orderkey % 97 AS VARCHAR) AS k
        |  FROM orders),
        |b_mod_key AS (SELECT CAST(c_custkey % 97 AS VARCHAR) AS k
        |  FROM customer),
        |r AS (${lane("pk_fk")}
        |  UNION ALL ${lane("skewed")}
        |  UNION ALL ${lane("mod_key")})
        |SELECT join_key, est, true_n,
        |  CAST(sign(est - true_n) AS BIGINT)
        |    * (abs(est - true_n) * 1000000 // greatest(true_n, 1))
        |    AS err_ppm
        |FROM r ORDER BY join_key""".stripMargin
      }),

    // ---- q562: negative-sampling table (unigram^(3/4)) --------------------------------
    // The word2vec negative-sampling distribution: p(w) ∝ c(w)^{3/4},
    // the de-facto standard for contrastive negatives (q436's
    // candidate source, now with the right marginal). The fractional
    // power stays integer-exact in both engines as a double integer
    // square root: c^{3/4} = isqrt(isqrt(c³)) with isqrt =
    // floor(sqrt(CAST AS DOUBLE)) — exact below 2⁵², and c³ ≤ 10¹⁸
    // through sf ≈ 100's token counts. Output: top-20 tokens by
    // smoothed weight with each token's raw and smoothed share in ppm
    // — the smoothing visibly lifts the tail (raw_ppm > smooth_ppm for
    // heads, inverted for tails), which is the point of the 3/4.
    QueryDef("q562_negative_sampling",
      (s, d) => {
        val cnt = documents(s, d)
          .select(explode(graft.ops.Text.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val wAll = "OVER ()"
        cnt.withColumn("w", expr(
          "CAST(floor(sqrt(CAST(CAST(floor(sqrt(CAST(c * c * c AS DOUBLE)))" +
            " AS BIGINT) AS DOUBLE))) AS BIGINT)"))
          .withColumn("raw_ppm", expr(s"c * 1000000 div sum(c) $wAll"))
          .withColumn("smooth_ppm", expr(s"w * 1000000 div sum(w) $wAll"))
          .orderBy(desc("c"), col("tok")).limit(20)
      },
      Some(s"""WITH cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(${DuckSql.toks("text")}) AS tok
        |    FROM documents) GROUP BY 1),
        |w AS (SELECT tok, c,
        |    CAST(floor(sqrt(CAST(CAST(floor(sqrt(CAST(c * c * c AS DOUBLE)))
        |      AS BIGINT) AS DOUBLE))) AS BIGINT) AS w
        |  FROM cnt)
        |SELECT tok, c, w,
        |  c * 1000000 // CAST(sum(c) OVER () AS BIGINT) AS raw_ppm,
        |  w * 1000000 // CAST(sum(w) OVER () AS BIGINT) AS smooth_ppm
        |FROM w ORDER BY c DESC, tok LIMIT 20""".stripMargin))
  )
}
