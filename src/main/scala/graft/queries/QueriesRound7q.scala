package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 seventeenth batch: MRR/Success@10 (completing the
  * retrieval-eval family), RLHF preference-pair construction, the
  * referential-integrity orphan audit, and exact log-free
  * distribution-drift metrics (TV distance + chi-square).
  */
object QueriesRound7q {

  val defs: Seq[QueryDef] = Seq(

    // ---- q353: MRR + Success@10 of MIPS retrieval ----------------------
    // The first-relevant metric next to q307's graded nDCG: system
    // ranking = full-dim integer MIPS top-10 (q306/q307 machinery),
    // rr = 10⁶ div rank of the FIRST label match (exactly integer —
    // no discount table needed), success = any match in the cut.
    // Queries are a bounded broadcast probe set; ranks come from a
    // per-query window over the probe fan-out.
    QueryDef("q353_mrr_at_10",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d).select(col("vec_id"),
          col("label").cast("long").as("label"), qv.as("v"))
        val probes = broadcast(emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"),
            col("label").as("qlabel"), col("v").as("qv")))
        val wq = Window.partitionBy(col("query_id"))
        emb.crossJoin(probes).where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qlabel"), col("label"),
            aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y),
              lit(0L), (acc, x) => acc + x).as("dot"),
            col("vec_id"))
          .withColumn("rn", row_number().over(
            wq.orderBy(col("dot").desc, col("vec_id"))))
          .where(col("rn") <= 10)
          .groupBy("query_id")
          .agg(min(when(col("label") === col("qlabel"), col("rn")))
            .cast("long").as("first_rel_rank"))
          .select(col("query_id"), col("first_rel_rank"),
            coalesce(expr("1000000L div first_rel_rank"), lit(0L))
              .as("rr_micro"),
            col("first_rel_rank").isNotNull.as("success_at_10"))
          .orderBy("query_id")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))
        |      AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
        |  FROM e WHERE vec_id < 20),
        |d AS (SELECT p.query_id, p.qlabel, e.label, e.vec_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> e.v[i] * p.qv[i])) AS dot
        |  FROM e, p WHERE e.vec_id <> p.query_id),
        |r AS (SELECT query_id, qlabel, label,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, vec_id) AS rn FROM d),
        |f AS (SELECT query_id,
        |    min(CASE WHEN label = qlabel THEN rn END) AS first_rel_rank
        |  FROM r WHERE rn <= 10 GROUP BY 1)
        |SELECT query_id, CAST(first_rel_rank AS BIGINT)
        |    AS first_rel_rank,
        |  CAST(coalesce(1000000 // first_rel_rank, 0) AS BIGINT)
        |    AS rr_micro,
        |  first_rel_rank IS NOT NULL AS success_at_10
        |FROM f ORDER BY query_id""".stripMargin)),

    // ---- q354: RLHF preference-pair construction -----------------------
    // Preference data prep: per source cluster, chosen = the quality
    // argmax, rejected = the argmin (score = integer quality
    // surrogate: n_chars + 3·distinct tokens — deterministic, id
    // tie-break), margin = score gap. One pass to per-doc scores, one
    // struct-min/max agg per source — no window, no sort of the
    // corpus. Degenerate single-doc sources would emit chosen ==
    // rejected; filtered (honest: no preference signal there).
    QueryDef("q354_preference_pairs",
      (s, d) => {
        val scored = documents(s, d)
          .select(col("source"), col("doc_id"),
            (col("n_chars") + lit(3L) *
              size(array_distinct(graft.ops.Text.tokens(col("text"))))
                .cast("long")).as("score"))
        scored.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            max(struct(col("score"), (-col("doc_id")).as("__ni")))
              .as("__mx"),
            min(struct(col("score"), (-col("doc_id")).as("__ni")))
              .as("__mn"))
          .where(col("n_docs") > 1)
          .select(col("source"), col("n_docs"),
            (-col("__mx.__ni")).as("chosen_id"),
            col("__mx.score").as("chosen_score"),
            (-col("__mn.__ni")).as("rejected_id"),
            col("__mn.score").as("rejected_score"),
            (col("__mx.score") - col("__mn.score")).as("margin"))
          .orderBy("source")
      },
      Some(s"""WITH sc AS (SELECT source, doc_id,
        |    n_chars + 3 * len(list_distinct(${DuckSql.toks("text")}))
        |      AS score
        |  FROM documents),
        |mx AS (SELECT source, score, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rx,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score, doc_id DESC) AS rn
        |  FROM sc),
        |n AS (SELECT source, count(*) AS n_docs FROM sc GROUP BY 1)
        |SELECT n.source, CAST(n.n_docs AS BIGINT) AS n_docs,
        |  a.doc_id AS chosen_id, CAST(a.score AS BIGINT) AS chosen_score,
        |  b.doc_id AS rejected_id,
        |  CAST(b.score AS BIGINT) AS rejected_score,
        |  CAST(a.score - b.score AS BIGINT) AS margin
        |FROM n
        |JOIN (SELECT * FROM mx WHERE rx = 1) a ON a.source = n.source
        |JOIN (SELECT * FROM mx WHERE rn = 1) b ON b.source = n.source
        |WHERE n.n_docs > 1 ORDER BY n.source""".stripMargin)),

    // ---- q355: referential-integrity orphan audit ----------------------
    // The FK health check a data contract needs: orphan counts and
    // ppm in BOTH directions for orders↔customer and lineitem↔part —
    // four anti-join counts (each a semi/anti shuffle on the key,
    // never a full join materialization), unioned into one audit
    // frame. Clean FKs report 0; the readout IS the contract.
    QueryDef("q355_orphan_audit",
      (s, d) => {
        def audit(name: String, child: org.apache.spark.sql.DataFrame,
                  childKey: String,
                  parent: org.apache.spark.sql.DataFrame,
                  parentKey: String) = {
          val orphans = child.select(col(childKey).as("__k"))
            .join(parent.select(col(parentKey).as("__k")), Seq("__k"),
              "left_anti")
            .agg(count(lit(1)).as("__o"))
          val tot = child.agg(count(lit(1)).as("__n"))
          orphans.crossJoin(tot)
            .select(lit(name).as("relation"), col("__n").as("n_rows"),
              col("__o").as("n_orphans"),
              expr("(__o * 1000000) div __n").as("orphan_ppm"))
        }
        audit("orders->customer", orders(s, d), "o_custkey",
            customer(s, d), "c_custkey")
          .unionByName(audit("customer->orders", customer(s, d),
            "c_custkey", orders(s, d), "o_custkey"))
          .unionByName(audit("lineitem->part", lineitem(s, d),
            "l_partkey", part(s, d), "p_partkey"))
          .unionByName(audit("part->lineitem", part(s, d), "p_partkey",
            lineitem(s, d), "l_partkey"))
          .orderBy("relation")
      },
      Some("""SELECT * FROM (
        |  SELECT 'orders->customer' AS relation,
        |    CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
        |    CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |      (SELECT c_custkey FROM customer)) AS BIGINT) AS n_orphans,
        |    CAST(((SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |      (SELECT c_custkey FROM customer)) * 1000000)
        |      // (SELECT count(*) FROM orders) AS BIGINT) AS orphan_ppm
        |  UNION ALL
        |  SELECT 'customer->orders',
        |    CAST((SELECT count(*) FROM customer) AS BIGINT),
        |    CAST((SELECT count(*) FROM customer WHERE c_custkey NOT IN
        |      (SELECT o_custkey FROM orders)) AS BIGINT),
        |    CAST(((SELECT count(*) FROM customer WHERE c_custkey NOT IN
        |      (SELECT o_custkey FROM orders)) * 1000000)
        |      // (SELECT count(*) FROM customer) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem->part',
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT),
        |    CAST((SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
        |      (SELECT p_partkey FROM part)) AS BIGINT),
        |    CAST(((SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
        |      (SELECT p_partkey FROM part)) * 1000000)
        |      // (SELECT count(*) FROM lineitem) AS BIGINT)
        |  UNION ALL
        |  SELECT 'part->lineitem',
        |    CAST((SELECT count(*) FROM part) AS BIGINT),
        |    CAST((SELECT count(*) FROM part WHERE p_partkey NOT IN
        |      (SELECT l_partkey FROM lineitem)) AS BIGINT),
        |    CAST(((SELECT count(*) FROM part WHERE p_partkey NOT IN
        |      (SELECT l_partkey FROM lineitem)) * 1000000)
        |      // (SELECT count(*) FROM part) AS BIGINT)
        |) ORDER BY relation""".stripMargin)),

    // ---- q356: distribution drift, log-free (TV + chi-square) ----------
    // Week-over-week drift of the purchase-value distribution WITHOUT
    // PSI's logarithm: 16 equal-width cent bins, total-variation
    // distance ½Σ|p₁−p₂| as cross-multiplied integers in ppm, and the
    // chi-square statistic Σ(n₁·N₂−n₂·N₁)²·10⁶ div (N₁·N₂·(n₁+n₂))
    // — both exact, both zero iff the histograms agree. Bin frames
    // are O(bins); the weekly split is one predicate.
    QueryDef("q356_distribution_drift",
      (s, d) => {
        val ev = events(s, d).where(col("event_type") === "purchase")
          .select(expr("cast(cast(value as decimal(18,2)) * 100" +
            " as bigint)").as("__c"),
            expr("unix_micros(ts) div 604800000000").as("__wk"))
        val mm = broadcast(ev.agg(min("__c").as("__mn"),
          max("__c").as("__mx"), min("__wk").as("__w0")))
        val binned = ev.crossJoin(mm)
          .select(expr("((__c - __mn) * 16) div (__mx - __mn + 1)")
            .as("bin"), (col("__wk") === col("__w0")).as("__isA"))
          .groupBy("bin")
          .agg(sum(when(col("__isA"), 1L).otherwise(0L)).as("n1"),
            sum(when(!col("__isA"), 1L).otherwise(0L)).as("n2"))
        val tots = broadcast(binned.agg(sum("n1").as("__t1"),
          sum("n2").as("__t2")))
        // cross-multiplied terms reach N² (and N³ under the ·10⁶) —
        // decimal(38,0) lanes keep the audit exact at any corpus size
        binned.crossJoin(tots)
          .agg(
            expr("sum(abs(cast(n1 as decimal(38,0)) * __t2" +
              " - cast(n2 as decimal(38,0)) * __t1)) * 1000000")
              .as("__tvn"),
            max("__t1").as("__t1x"), max("__t2").as("__t2x"),
            sum(expr("CASE WHEN n1 + n2 > 0 THEN" +
              " ((cast(n1 as decimal(38,0)) * __t2" +
              "   - cast(n2 as decimal(38,0)) * __t1)" +
              "  * (cast(n1 as decimal(38,0)) * __t2" +
              "   - cast(n2 as decimal(38,0)) * __t1))" +
              " div ((cast(__t1 as decimal(38,0)) * __t2) * (n1 + n2))" +
              " ELSE 0L END")).as("__chi"))
          .select(
            expr("cast(__tvn div (2 * cast(__t1x as decimal(38,0))" +
              " * __t2x) as bigint)").as("tv_ppm"),
            col("__chi").as("chi2_scaled"),
            col("__t1x").as("n_week1"), col("__t2x").as("n_week2"))
      },
      Some("""WITH e AS (SELECT
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    epoch_us(ts) // 604800000000 AS wk
        |  FROM events WHERE event_type = 'purchase'),
        |mm AS (SELECT min(c) AS mn, max(c) AS mx, min(wk) AS w0 FROM e),
        |b AS (SELECT ((e.c - mm.mn) * 16) // (mm.mx - mm.mn + 1) AS bin,
        |    sum(CASE WHEN e.wk = mm.w0 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN e.wk <> mm.w0 THEN 1 ELSE 0 END) AS n2
        |  FROM e, mm GROUP BY 1),
        |t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM b)
        |SELECT
        |  CAST((sum(abs(CAST(n1 AS HUGEINT) * t.t2
        |      - CAST(n2 AS HUGEINT) * t.t1)) * 1000000)
        |    // (2 * CAST(t.t1 AS HUGEINT) * t.t2) AS BIGINT) AS tv_ppm,
        |  CAST(sum(CASE WHEN n1 + n2 > 0 THEN
        |    ((CAST(n1 AS HUGEINT) * t.t2 - CAST(n2 AS HUGEINT) * t.t1)
        |     * (CAST(n1 AS HUGEINT) * t.t2 - CAST(n2 AS HUGEINT) * t.t1))
        |    // ((CAST(t.t1 AS HUGEINT) * t.t2) * (n1 + n2))
        |    ELSE 0 END) AS BIGINT) AS chi2_scaled,
        |  CAST(t.t1 AS BIGINT) AS n_week1,
        |  CAST(t.t2 AS BIGINT) AS n_week2
        |FROM b, t GROUP BY t.t1, t.t2""".stripMargin)))
}
