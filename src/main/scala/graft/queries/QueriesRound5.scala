package graft.queries

import graft.Tables._
import graft.ops.{Graph, Relational}
import org.apache.spark.sql.functions._

/** Round-5 widening: renormalized (dangling-mass) PageRank over a
  * directed DAG that genuinely has dangling nodes, and the one-call
  * MERGE INTO upsert/delete every lakehouse engine exposes. Both are
  * exact/deterministic by construction so the DuckDB oracle
  * hash-verifies the whole computation.
  */
object QueriesRound5 {

  val defs: Seq[QueryDef] = Seq(

    // ---- q162: PageRank with dangling-mass redistribution -----------
    // The q145 integer-exact formulation, completed for DIRECTED
    // graphs: co-purchase pairs ordered low-part → high-part form a
    // DAG whose sink parts (never the smaller key of any pair) are
    // genuinely dangling, and their rank mass is collected into one
    // scalar per round and redistributed to every node —
    // next = base + damp*(Σ contrib + danglingSum div N) — instead of
    // decaying. All BIGINT floor division, so the oracle replays both
    // rounds (and both dangling sums) as chained CTEs and the hash
    // check covers the whole iteration including the redistribution.
    QueryDef("q162_pagerank_dangling",
      (s, d) => {
        val li = lineitem(s, d).where(col("l_orderkey") % 5 === 0)
          .select("l_orderkey", "l_partkey")
        val e = li.withColumnRenamed("l_partkey", "src")
          .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
          .where(col("src") < col("dst"))
          .select("src", "dst")
        Relational.topK(
            Graph.pageRankRedistributed(e, "src", "dst", iters = 2),
            Seq(col("rank_micro").desc, col("id").asc), 100)
          .select(col("id").as("part_id"), col("rank_micro"))
      },
      Some {
        def round_(prev: String, dmCur: String, rCur: String) =
          s"""$dmCur AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm
          |  FROM $prev WHERE id NOT IN (SELECT src FROM deg)),
          |$rCur AS (SELECT n.id, CAST(150000 + (85 * (coalesce(s.s, 0)
          |      + (SELECT dm FROM $dmCur) // (SELECT cnt FROM nn))) // 100
          |    AS BIGINT) AS r
          |  FROM nodes n LEFT JOIN (
          |    SELECT e.dst AS id, CAST(sum($prev.r // deg.d) AS BIGINT) AS s
          |    FROM e JOIN $prev ON $prev.id = e.src
          |    JOIN deg ON deg.src = e.src GROUP BY 1) s ON s.id = n.id)"""
        s"""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |      AND a.l_partkey < b.l_partkey
        |    WHERE a.l_orderkey % 5 = 0),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS cnt FROM nodes),
        |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |${round_("r0", "dm1", "r1")},
        |${round_("r1", "dm2", "r2")}
        |SELECT id AS part_id, r AS rank_micro FROM r2
        |ORDER BY rank_micro DESC, part_id LIMIT 100""".stripMargin
      }),

    // ---- q163: MERGE INTO (one-call upsert/insert/delete) -----------
    // Relational.mergeInto on a customer snapshot: keys %5 or %7 get
    // updated balances, %101 keys insert as brand-new customers, and
    // the deleteWhen predicate (%7) removes keys — one full-outer join,
    // the base never windowed or double-scanned. Balances live in
    // integer cents so every merged value is exact and hash-checkable.
    QueryDef("q163_merge_into",
      (s, d) => {
        val base = customer(s, d).select(col("c_custkey"), col("c_name"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
        val updates = base
          .where(col("c_custkey") % 5 === 0 || col("c_custkey") % 7 === 0)
          .select(col("c_custkey"), col("c_name"),
            (col("bal_cents") + 10000L).as("bal_cents"))
        val inserts = base.where(col("c_custkey") % 101 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            concat(col("c_name"), lit("_new")).as("c_name"),
            col("bal_cents"))
        Relational.mergeInto(base, updates.unionByName(inserts), "c_custkey",
            deleteWhen = col("c_custkey") % 7 === 0)
          .orderBy("c_custkey")
      },
      Some("""WITH b AS (SELECT c_custkey, c_name,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
        |s0 AS (SELECT c_custkey, c_name, bal_cents + 10000 AS bal_cents
        |    FROM b WHERE c_custkey % 5 = 0 OR c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || '_new', bal_cents
        |    FROM b WHERE c_custkey % 101 = 0),
        |s AS (SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 THEN 'delete'
        |      ELSE 'upsert' END AS op, c_name, bal_cents FROM s0),
        |m AS (SELECT coalesce(b.c_custkey, s.c_custkey) AS c_custkey, s.op,
        |    CASE WHEN s.op = 'upsert' THEN s.c_name ELSE b.c_name END AS c_name,
        |    CASE WHEN s.op = 'upsert' THEN s.bal_cents ELSE b.bal_cents END
        |      AS bal_cents
        |  FROM b FULL OUTER JOIN s ON b.c_custkey = s.c_custkey)
        |SELECT c_custkey, c_name, CAST(bal_cents AS BIGINT) AS bal_cents
        |FROM m WHERE op IS NULL OR op != 'delete' ORDER BY 1""".stripMargin)))
}
