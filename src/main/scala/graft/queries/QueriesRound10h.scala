package graft.queries

import graft.Tables._
import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-10 eighth batch: full k-core DECOMPOSITION — the per-node
  * shell index extending the binary q171 k-core question.
  */
object QueriesRound10h {

  private val MaxK = 8
  private val RoundsPerK = 2

  val defs: Seq[QueryDef] = Seq(

    // ---- q567: core decomposition (shell histogram) ------------------------------
    // shell(v) = largest k ≤ 8 surviving the bounded peel (2 rounds
    // per k, the q149 bounded-round semantics — the oracle replays the
    // IDENTICAL 16 peels as MATERIALIZED chained CTEs, the q532
    // lesson, since every peel references its alive set twice). Cores
    // are nested so each peel starts from the previous survivor set;
    // the edge frame (co-purchase, distinct, symmetrized) lays out
    // once. Output is the shell histogram — the robustness profile
    // of the product graph.
    QueryDef("q567_core_decomposition",
      (s, d) => {
        val li = lineitem(s, d).where(col("l_orderkey") % 7 === 0)
          .select("l_orderkey", "l_partkey")
        val ed = li.withColumnRenamed("l_partkey", "src")
          .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
          .where(col("src") < col("dst"))
          .select("src", "dst").distinct()
        Graph.coreDecomposition(ed, "src", "dst",
          maxK = MaxK, roundsPerK = RoundsPerK)
          .groupBy("shell").agg(count(lit(1)).as("n_nodes"))
          .orderBy("shell")
      },
      Some {
        val peels = (1 to MaxK).flatMap { k =>
          (1 to RoundsPerK).map { r =>
            val prev =
              if (k == 1 && r == 1) "n0"
              else if (r == 1) s"a${k - 1}$RoundsPerK"
              else s"a$k${r - 1}"
            s"""a$k$r AS MATERIALIZED (SELECT src AS id FROM e2
               |  WHERE src IN (SELECT id FROM $prev)
               |    AND dst IN (SELECT id FROM $prev)
               |  GROUP BY 1 HAVING count(*) >= $k)""".stripMargin
          }
        }.mkString(",\n")
        val unions = (1 to MaxK)
          .map(k => s"SELECT id, $k AS k FROM a$k$RoundsPerK")
          .mkString("\n  UNION ALL ")
        s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey % 7 = 0),
        |e1 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |e2 AS MATERIALIZED (SELECT src, dst FROM e1
        |  UNION ALL SELECT dst, src FROM e1),
        |n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e2),
        |$peels,
        |sh AS (SELECT id, CAST(max(k) AS BIGINT) AS shell FROM (
        |  $unions) GROUP BY 1)
        |SELECT coalesce(shell, 0) AS shell,
        |  CAST(count(*) AS BIGINT) AS n_nodes
        |FROM n0 LEFT JOIN sh USING (id)
        |GROUP BY 1 ORDER BY 1""".stripMargin
      })
  )
}
