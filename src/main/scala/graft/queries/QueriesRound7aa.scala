package graft.queries

import graft.Tables._
import graft.ops.{Relational, Sampling, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-7 twenty-seventh batch: the declarative data-expectations
  * ledger, inference padding-waste policy comparison, and the paired
  * Poisson bootstrap for system comparisons.
  */
object QueriesRound7aa {

  /** floor(P(Poisson(1) ≤ j)·2³²) for j = 0..6 — q304's pinned
    * truncated inverse-CDF table, regenerated from StrictMath. */
  private val poissonCdf32: Seq[Long] = {
    var term = StrictMath.exp(-1.0); var acc = 0.0
    (0 to 6).map { j =>
      if (j > 0) term /= j
      acc += term
      math.floor(acc * 4294967296.0).toLong
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q389: declarative expectation-suite ledger ---------------------
    // The "great expectations" runner unifying the piecewise audits
    // (q243 constraints, q345 schema drift, q355 orphans): six
    // declared checks over orders/lineitem — not-null, positivity,
    // value domain, key uniqueness, FK containment, date range (the generator emits 1995–2001) — each
    // one aggregation (uniqueness via count−distinct, FK via an
    // anti-join count), results as one ledger frame. At 100 TB each
    // check is a single scan-side fold; nothing row-sized leaves the
    // executors.
    QueryDef("q389_expectation_suite",
      (s, d) => {
        val o = orders(s, d)
        def check(name: String, df: DataFrame): DataFrame =
          df.select(lit(name).as("check"), col("n_checked"),
            col("n_violations"),
            (col("n_violations") === 0L).as("pass"))
        val notNull = check("custkey_not_null", o.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
            .as("n_violations")))
        val positive = check("totalprice_positive", o.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L))
            .as("n_violations")))
        val domain = check("priority_in_domain", o.agg(
          count(lit(1)).as("n_checked"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH",
            "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 1L).otherwise(0L))
            .as("n_violations")))
        val unique = check("orderkey_unique", o.agg(
          count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("o_orderkey")))
            .as("n_violations")))
        val fk = check("lineitem_fk_orders", lineitem(s, d)
          .select(col("l_orderkey"))
          .join(o.select(col("o_orderkey").as("l_orderkey")),
            Seq("l_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .crossJoin(lineitem(s, d).agg(count(lit(1)).as("n_checked")))
          .select(col("n_checked"), col("n_violations")))
        val range = check("orderdate_in_range", o.agg(
          count(lit(1)).as("n_checked"),
          sum(when(year(col("o_orderdate")) < 1995 ||
            year(col("o_orderdate")) > 2001, 1L).otherwise(0L))
            .as("n_violations")))
        notNull.unionByName(positive).unionByName(domain)
          .unionByName(unique).unionByName(fk).unionByName(range)
          .orderBy("check")
      },
      Some("""SELECT * FROM (
        |SELECT 'custkey_not_null' AS "check",
        |  CAST(count(*) AS BIGINT) AS n_checked,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_violations,
        |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS pass
        |FROM orders
        |UNION ALL SELECT 'totalprice_positive',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
        |FROM orders
        |UNION ALL SELECT 'priority_in_domain', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |    '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
        |    '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 1 ELSE 0 END) = 0
        |FROM orders
        |UNION ALL SELECT 'orderkey_unique', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
        |  count(*) = count(DISTINCT o_orderkey) FROM orders
        |UNION ALL SELECT 'lineitem_fk_orders',
        |  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |  CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)) AS BIGINT),
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)) = 0
        |UNION ALL SELECT 'orderdate_in_range', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN year(o_orderdate) < 1995 OR
        |    year(o_orderdate) > 2001 THEN 1 ELSE 0 END) AS BIGINT),
        |  sum(CASE WHEN year(o_orderdate) < 1995 OR year(o_orderdate)
        |    > 2001 THEN 1 ELSE 0 END) = 0
        |FROM orders) ORDER BY "check" """.stripMargin)),

    // ---- q390: inference padding-waste policy comparison ----------------
    // The serving-side twin of q192's packing efficiency: batching
    // sequences of unequal length pads every batch to its max, and the
    // policy decides the bill. Three policies over batch size 8 —
    // arrival order (doc_id div 8, ids are dense), length-BUCKETED
    // routing (rank within n-div-32 buckets via ONE global
    // twoLevelRankDesc ordered (bucket, id) + O(buckets) offsets — no
    // per-bucket single-task window), and the sorted ideal (global
    // two-level rank on length). Waste ppm = padded−real over padded.
    // The sorted lower bound and the arrival upper bound bracket what
    // a router can buy; ordering law pinned in Round7aaSpec.
    QueryDef("q390_padding_waste",
      (s, d) => {
        val seqs = documents(s, d).select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("n"))
        def readout(name: String, batched: DataFrame): DataFrame =
          batched.groupBy("batch")
            .agg(count(lit(1)).as("bc"), max("n").as("mx"), sum("n").as("sn"))
            .agg(count(lit(1)).as("n_batches"),
              sum("sn").as("sum_tokens"),
              sum(col("mx") * col("bc")).as("sum_padded"))
            .select(lit(name).as("policy"), col("n_batches"),
              col("sum_tokens"), col("sum_padded"),
              expr("((sum_padded - sum_tokens) * 1000000) div sum_padded")
                .as("waste_ppm"))
        val arrival = readout("1_arrival",
          seqs.withColumn("batch", expr("doc_id div 8")))
        // bucketed: ONE global two-level rank ordered (bucket asc,
        // doc_id asc) — score −bk, id tiebreak — then within-bucket
        // position = rank − bucket offset (O(buckets) frame)
        val bucketed = {
          val keyed = seqs.withColumn("bk", expr("n div 32"))
          val ranked = Relational.twoLevelRankDesc(
            keyed.withColumn("__s", -col("bk")), "__s", "doc_id",
            idWidth = 4096L, outCol = "grk")
          val offs = ranked.groupBy("bk").agg(count(lit(1)).as("c"))
            .withColumn("off", coalesce(sum("c").over(
              org.apache.spark.sql.expressions.Window.orderBy("bk")
                .rowsBetween(org.apache.spark.sql.expressions.Window
                  .unboundedPreceding, -1)), lit(0L)))
            .select(col("bk"), col("off"))
          readout("2_bucketed", ranked.join(broadcast(offs), Seq("bk"))
            .withColumn("batch",
              expr("bk * 1048576 + (grk - off - 1) div 8")))
        }
        val sorted = readout("3_sorted", Relational.twoLevelRankDesc(
            seqs.withColumn("__s", col("n")), "__s", "doc_id",
            idWidth = 4096L, outCol = "rk")
          .withColumn("batch", expr("(rk - 1) div 8")))
        arrival.unionByName(bucketed).unionByName(sorted)
          .orderBy("policy")
      },
      Some {
        def ro(name: String, src: String) =
          s"""SELECT '$name' AS policy,
             |  CAST(count(*) AS BIGINT) AS n_batches,
             |  CAST(sum(sn) AS BIGINT) AS sum_tokens,
             |  CAST(sum(mx * bc) AS BIGINT) AS sum_padded,
             |  CAST(((sum(mx * bc) - sum(sn)) * 1000000)
             |    // sum(mx * bc) AS BIGINT) AS waste_ppm
             |FROM (SELECT batch, count(*) AS bc, max(n) AS mx,
             |    sum(n) AS sn FROM $src GROUP BY 1)""".stripMargin
        s"""WITH seqs AS (SELECT doc_id,
        |    len(${DuckSql.toks("text")}) AS n FROM documents),
        |arr AS (SELECT n, doc_id // 8 AS batch FROM seqs),
        |bkt AS (SELECT n, (n // 32) * 1048576 +
        |    (row_number() OVER (PARTITION BY n // 32 ORDER BY doc_id)
        |      - 1) // 8 AS batch FROM seqs),
        |srt AS (SELECT n,
        |    (row_number() OVER (ORDER BY n DESC, doc_id) - 1) // 8
        |      AS batch FROM seqs)
        |SELECT * FROM (
        |${ro("1_arrival", "arr")}
        |UNION ALL ${ro("2_bucketed", "bkt")}
        |UNION ALL ${ro("3_sorted", "srt")})
        |ORDER BY policy""".stripMargin
      }),

    // ---- q391: paired Poisson bootstrap system comparison ---------------
    // "Is gate A stricter than gate B, significantly?" — the paired
    // version of q304: per-doc outcome DELTA between two curation
    // gates (chars ≥ 200 vs tokens ≥ 40), the same 64 deterministic
    // Poisson(1) replicates reweighting the deltas, CI from the
    // replicate order statistics, plus the fraction of replicates with
    // a positive delta (the bootstrap significance). Pairing is what
    // makes small per-system differences detectable — the variance of
    // the delta, not of each system, drives the CI width. Deltas can
    // be NEGATIVE, and Spark's `div` truncates while DuckDB's `//`
    // floors — so every mean divides the (delta+1)-shifted nonnegative
    // sum and subtracts 10⁶ after: exact FLOOR on both engines.
    QueryDef("q391_paired_bootstrap",
      (s, d) => {
        val b = 64
        val docs = documents(s, d).select(col("doc_id"),
          (when(col("n_chars") >= 200, 1L).otherwise(0L) -
            when(size(Text.tokens(col("text"))) >= 40, 1L).otherwise(0L))
            .as("delta"))
        val u = Sampling.hashLong(concat(col("doc_id").cast("string"),
          lit("#pb"), col("__b").cast("string")))
        val w = poissonCdf32.map(t =>
          when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
        val reps = docs
          .select(col("doc_id"), col("delta"),
            explode(sequence(lit(0), lit(b - 1))).as("__b"))
          .select(col("__b"), col("delta"), w.as("__w"))
          .groupBy("__b")
          .agg(sum("__w").as("__sw"),
            sum(col("__w") * (col("delta") + 1L)).as("__s1"))
          .select(col("__b"),
            expr("(__s1 * 1000000) div greatest(__sw, 1) - 1000000")
              .as("__m"))
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("__m"), col("__b"))))
        val lo = reps.where(col("__rn") === 2)
          .select(col("__m").as("lo_micro"))
        val hi = reps.where(col("__rn") === b - 1)
          .select(col("__m").as("hi_micro"))
        val pos = reps.agg((sum(when(col("__m") > 0, 1L).otherwise(0L))
          * 1000000L / b).cast("long").as("pos_ppm"))
        docs.agg(count(lit(1)).as("n_docs"),
            expr("(sum(delta + 1) * 1000000) div count(1) - 1000000")
              .as("point_micro"))
          .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
          .crossJoin(broadcast(pos))
          .select(col("n_docs"), col("point_micro"),
            lit(b.toLong).as("n_replicates"), col("lo_micro"),
            col("hi_micro"), col("pos_ppm"))
      },
      Some {
        val u = DuckSql.hashLong(
          "CAST(doc_id AS VARCHAR) || '#pb' || CAST(b AS VARCHAR)")
        val w = poissonCdf32.map(t =>
          s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH docs AS (SELECT doc_id,
        |    (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) -
        |    (CASE WHEN len(${DuckSql.toks("text")}) >= 40
        |      THEN 1 ELSE 0 END) AS delta
        |  FROM documents),
        |bs AS (SELECT unnest(generate_series(0, 63)) AS b),
        |rows0 AS (SELECT doc_id, delta, b, $w AS w FROM docs, bs),
        |reps AS (SELECT b, (sum(w * (delta + 1)) * 1000000)
        |    // greatest(sum(w), 1) - 1000000 AS m FROM rows0 GROUP BY 1),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn
        |  FROM reps),
        |pt AS (SELECT count(*) AS n_docs,
        |    (sum(delta + 1) * 1000000) // count(*) - 1000000
        |      AS point_micro FROM docs)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(point_micro AS BIGINT) AS point_micro,
        |  CAST(64 AS BIGINT) AS n_replicates,
        |  CAST((SELECT m FROM rk WHERE rn = 2) AS BIGINT) AS lo_micro,
        |  CAST((SELECT m FROM rk WHERE rn = 63) AS BIGINT) AS hi_micro,
        |  CAST((SELECT sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) * 1000000
        |    // 64 FROM reps) AS BIGINT) AS pos_ppm
        |FROM pt""".stripMargin
      }))
}
