package graft.queries

import graft.Tables._
import graft.ops.{Graph, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-6 seventh batch: weighted shortest paths (the cost-graph
  * counterpart of q149's unweighted BFS), bounded-round power
  * iteration for the corpus' dominant embedding direction, a
  * Deequ-style declarative data-quality constraint audit, and the
  * code-vs-prose heuristic a mixed web corpus needs before routing
  * documents to code-specific curation. Everything that reaches the
  * hash check is integer-exact.
  */
object QueriesRound6g {

  val defs: Seq[QueryDef] = Seq(

    // ---- q241: weighted SSSP (bounded Bellman-Ford) ------------------
    // Cheapest-path analysis over the customer↔supplier trade graph:
    // edge weight = min rounded quantity ever traded on the pair,
    // seeds = every 50th customer, 3 relaxation rounds
    // (Graph.weightedSssp). Distances are BIGINT and the fold is min,
    // so the oracle replays the rounds as chained CTEs — the q149/q145
    // reproducibility discipline with weights.
    QueryDef("q241_weighted_sssp",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_orderkey"),
          (col("l_suppkey") + 1000000L).as("supp"),
          round(col("l_quantity")).cast("long").as("w"))
        val e0 = li.join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("supp"), col("w"))
        val edges = e0.select(col("cust").as("src"), col("supp").as("dst"), col("w"))
          .union(e0.select(col("supp").as("src"), col("cust").as("dst"), col("w")))
        val seeds = customer(s, d).where(col("c_custkey") % 50 === 0)
          .select(col("c_custkey"))
        Graph.weightedSssp(edges, "src", "dst", "w", seeds, rounds = 3)
          .orderBy("id")
      },
      Some("""WITH e0 AS (SELECT o.o_custkey AS cust,
        |    l.l_suppkey + 1000000 AS supp,
        |    CAST(round(l.l_quantity) AS BIGINT) AS w
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst, min(w) AS w FROM (
        |    SELECT cust AS src, supp AS dst, w FROM e0
        |    UNION ALL SELECT supp AS src, cust AS dst, w FROM e0) u
        |  GROUP BY 1, 2),
        |d0 AS (SELECT DISTINCT c_custkey AS id, CAST(0 AS BIGINT) AS dist
        |  FROM customer WHERE c_custkey % 50 = 0),
        |d1 AS (SELECT id, min(dist) AS dist FROM (
        |    SELECT id, dist FROM d0
        |    UNION ALL SELECT e.dst AS id, d0.dist + e.w AS dist
        |      FROM e JOIN d0 ON e.src = d0.id) u GROUP BY 1),
        |d2 AS (SELECT id, min(dist) AS dist FROM (
        |    SELECT id, dist FROM d1
        |    UNION ALL SELECT e.dst AS id, d1.dist + e.w AS dist
        |      FROM e JOIN d1 ON e.src = d1.id) u GROUP BY 1),
        |d3 AS (SELECT id, min(dist) AS dist FROM (
        |    SELECT id, dist FROM d2
        |    UNION ALL SELECT e.dst AS id, d2.dist + e.w AS dist
        |      FROM e JOIN d2 ON e.src = d2.id) u GROUP BY 1)
        |SELECT id, dist FROM d3 ORDER BY id""".stripMargin)),

    // ---- q242: dominant embedding direction (power iteration) --------
    // The 1-component PCA audit over the Gram (uncentered covariance)
    // matrix: embeddings quantize to millis, each row's dims² products
    // map-side-combine straight to the 64×64 Gram frame (one corpus
    // scan, never row×row), then 2 integer power-iteration rounds with
    // max-abs-1000 rescale via the signed floor division
    // (x − pmod(x, m)) div m. Oracle replays the Gram build and both
    // rounds as chained CTEs (Similarity.gramPowerIteration).
    QueryDef("q242_power_iteration",
      (s, d) => Similarity.gramPowerIteration(
        embeddings(s, d), "embedding", dims = 64, rounds = 2)
        .orderBy("pos"),
      Some("""WITH q AS (SELECT list_transform(embedding[1:64],
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
        |  FROM embeddings),
        |g AS (SELECT s.i AS i, t.j AS j,
        |    CAST(sum(qv[s.i] * qv[t.j]) AS BIGINT) AS g
        |  FROM q, generate_series(1, 64) s(i), generate_series(1, 64) t(j)
        |  GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT j AS pos, CAST(1000 AS BIGINT) AS v FROM g),
        |w1 AS (SELECT g.i AS pos, CAST(sum(g.g * v0.v) AS BIGINT) AS w
        |  FROM g JOIN v0 ON g.j = v0.pos GROUP BY 1),
        |m1 AS (SELECT greatest(max(abs(w)), 1) AS m FROM w1),
        |v1 AS (SELECT pos, CAST((w * 1000
        |      - ((((w * 1000) % m) + m) % m)) // m AS BIGINT) AS v
        |  FROM w1, m1),
        |w2 AS (SELECT g.i AS pos, CAST(sum(g.g * v1.v) AS BIGINT) AS w
        |  FROM g JOIN v1 ON g.j = v1.pos GROUP BY 1),
        |m2 AS (SELECT greatest(max(abs(w)), 1) AS m FROM w2),
        |v2 AS (SELECT pos, CAST((w * 1000
        |      - ((((w * 1000) % m) + m) % m)) // m AS BIGINT) AS v
        |  FROM w2, m2)
        |SELECT pos, v FROM v2 ORDER BY pos""".stripMargin)),

    // ---- q243: declarative data-quality constraint audit -------------
    // The Deequ/expectations pattern as one engine query: referential
    // integrity (two FK orphan checks via one-pass left joins against
    // the DISTINCT key set), key uniqueness, not-null/non-blank, a
    // value-range rule, and a length budget that REALLY fails on this
    // corpus (n_chars ≤ 400 vs median 306) — a healthy audit shows
    // both outcomes. Each rule is one scan of its table; no rule ever
    // joins fact×fact.
    QueryDef("q243_constraint_audit",
      (s, d) => {
        val li = lineitem(s, d); val o = orders(s, d)
        val c = customer(s, d); val doc = documents(s, d)
        def pass1(df: DataFrame, name: String, bad: org.apache.spark.sql.Column) =
          df.agg(count(lit(1)).as("checked"),
            coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as("violations"))
            .select(lit(name).as("constraint_name"),
              col("checked"), col("violations"))
        val fkLine = li.select(col("l_orderkey").as("k"))
          .join(o.select(col("o_orderkey").as("k")).distinct()
            .withColumn("__hit", lit(1)), Seq("k"), "left")
          .transform(df => pass1(df, "lineitem_orderkey_fk", col("__hit").isNull))
        val fkOrd = o.select(col("o_custkey").as("k"))
          .join(c.select(col("c_custkey").as("k")).distinct()
            .withColumn("__hit", lit(1)), Seq("k"), "left")
          .transform(df => pass1(df, "orders_custkey_fk", col("__hit").isNull))
        val uniq = c.agg(count(lit(1)).as("checked"),
          (count(lit(1)) - countDistinct(col("c_custkey"))).as("violations"))
          .select(lit("customer_key_unique").as("constraint_name"),
            col("checked"), col("violations"))
        val nn = pass1(doc, "documents_text_nonblank",
          col("text").isNull || length(trim(col("text"))) === 0)
        val rng = pass1(li, "lineitem_quantity_range",
          col("l_quantity") < 1 || col("l_quantity") > 50)
        val dte = pass1(o, "orders_date_bound",
          col("o_orderdate") > lit("2002-01-01").cast("timestamp"))
        val len = pass1(doc, "documents_n_chars_le_400", col("n_chars") > 400)
        fkLine.union(fkOrd).union(uniq).union(nn)
          .union(rng).union(dte).union(len)
          .withColumn("pass", col("violations") === 0)
          .orderBy("constraint_name")
      },
      Some("""WITH rows0 AS (
        |  SELECT 'lineitem_orderkey_fk' AS constraint_name,
        |    (SELECT count(*) FROM lineitem) AS checked,
        |    (SELECT count(*) FROM lineitem l
        |      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |      ON l.l_orderkey = o.o_orderkey
        |      WHERE o.o_orderkey IS NULL) AS violations
        |  UNION ALL SELECT 'orders_custkey_fk',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o
        |      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |      ON o.o_custkey = c.c_custkey
        |      WHERE c.c_custkey IS NULL)
        |  UNION ALL SELECT 'customer_key_unique',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
        |  UNION ALL SELECT 'documents_text_nonblank',
        |    (SELECT count(*) FROM documents),
        |    (SELECT count(*) FROM documents
        |      WHERE text IS NULL OR length(trim(text)) = 0)
        |  UNION ALL SELECT 'lineitem_quantity_range',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem
        |      WHERE l_quantity < 1 OR l_quantity > 50)
        |  UNION ALL SELECT 'orders_date_bound',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders
        |      WHERE o_orderdate > TIMESTAMP '2002-01-01')
        |  UNION ALL SELECT 'documents_n_chars_le_400',
        |    (SELECT count(*) FROM documents),
        |    (SELECT count(*) FROM documents WHERE n_chars > 400))
        |SELECT constraint_name, CAST(checked AS BIGINT) AS checked,
        |  CAST(violations AS BIGINT) AS violations,
        |  violations = 0 AS pass
        |FROM rows0 ORDER BY constraint_name""".stripMargin)),

    // ---- q244: code-vs-prose routing signal --------------------------
    // A mixed web corpus routes code to different dedup/quality rules
    // than prose. Deterministic code twins (every 7th doc gets a code
    // tail appended — the planted-twin discipline of q224) give the
    // corpus both classes; the signal is pure literal counting:
    // semicolons, braces, and keyword hits via the length-delta trick
    // (len − len(replace))/len(token) — no regex dialect in play at
    // all — scored per kilochar in integer ppm. Output: per-lang doc
    // counts, code-flagged counts, and the mean score.
    QueryDef("q244_code_prose_signal",
      (s, d) => {
        val snippet = " def compute(x): return x * 2; } { var y = f(x); " +
          "if (y) { z += 1; } return z; "
        val t = documents(s, d)
          .withColumn("t", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(snippet))).otherwise(col("text")))
        // literal hit count via the length-delta trick; each removal
        // deletes exactly token.length chars so the quotient is exact —
        // keep every division integer (`div`) so no engine's
        // double→int cast semantics can drift (Spark truncates, DuckDB
        // CAST rounds)
        def hits(token: String): org.apache.spark.sql.Column = expr(
          s"(length(t) - length(replace(t, '$token', ''))) div ${token.length}")
        val scored = t.withColumn("score_num",
          (hits(";") * 2 + hits("{") * 3 + hits("}") * 3 +
            hits(" def ") * 5 + hits("return") * 5 + hits("var ") * 5) *
            lit(1000000L))
          .withColumn("score_ppm",
            expr("score_num div greatest(length(t), 1)"))
        scored
          .withColumn("code_like", col("score_ppm") >= 3000)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("code_like"), 1L).otherwise(0L)).as("n_code_like"),
            sum("score_ppm").as("sum_score"))
          .select(col("lang"), col("n_docs"), col("n_code_like"),
            expr("sum_score div n_docs").as("mean_score_ppm"))
          .orderBy("lang")
      },
      Some("""WITH t0 AS (SELECT lang, CASE WHEN doc_id % 7 = 0
        |    THEN text || ' def compute(x): return x * 2; } { var y = f(x); if (y) { z += 1; } return z; '
        |    ELSE text END AS t FROM documents),
        |sc AS (SELECT lang,
        |    CAST((
        |      (length(t) - length(replace(t, ';', ''))) // 1 * 2 +
        |      (length(t) - length(replace(t, '{', ''))) // 1 * 3 +
        |      (length(t) - length(replace(t, '}', ''))) // 1 * 3 +
        |      (length(t) - length(replace(t, ' def ', ''))) // 5 * 5 +
        |      (length(t) - length(replace(t, 'return', ''))) // 6 * 5 +
        |      (length(t) - length(replace(t, 'var ', ''))) // 4 * 5) * 1000000
        |      // greatest(length(t), 1) AS BIGINT) AS score_ppm
        |  FROM t0)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN score_ppm >= 3000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_code_like,
        |  CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_score_ppm
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin)))
}
