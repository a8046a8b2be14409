package graft.queries

import graft.Tables._
import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Round-6 twentieth batch: the two storage-layout techniques that
  * anchor 100 TB join/scan cost — bucketed co-located joins and
  * partition-pruned reads — promoted from plan-only specs to
  * oracle-verified queries (write → read-back → compute, end to end).
  */
object QueriesRound6t {

  val defs: Seq[QueryDef] = Seq(

    // ---- q285: bucketed co-located join ------------------------------
    // THE shuffle-elimination technique for repeated fact-fact joins:
    // both sides are written bucketed (8 buckets) and sorted on the
    // join key, so the sort-merge join reads bucket i against bucket i
    // with NO Exchange and NO Sort at query time (BucketingSpec pins
    // that plan) — at 100 TB this converts every recurring join on the
    // key into a map-side merge. Here the whole lifecycle runs inside
    // the query — write both bucketed tables, join, aggregate — and
    // the result hash-matches the plain-join oracle, proving layout
    // changes nothing about semantics. A mod-4 key slice bounds the
    // per-run write volume.
    QueryDef("q285_bucketed_join",
      (s, d) => {
        // scratch namespace keyed by (application id, data dir) so
        // concurrent sessions at different scale factors never race on
        // one path; `reset` also clears a crashed run's stale dir
        val db = Scratch.db(s, d)
        Seq("q285_orders", "q285_lineitem").foreach(Scratch.reset(s, d, _))
        orders(s, d).where(col("o_orderkey") % 4 === 0)
          .select("o_orderkey", "o_orderpriority")
          .write.format("parquet").bucketBy(8, "o_orderkey")
          .sortBy("o_orderkey").mode("overwrite")
          .saveAsTable(s"$db.q285_orders")
        lineitem(s, d).where(col("l_orderkey") % 4 === 0)
          .select("l_orderkey", "l_extendedprice", "l_discount")
          .write.format("parquet").bucketBy(8, "l_orderkey")
          .sortBy("l_orderkey").mode("overwrite")
          .saveAsTable(s"$db.q285_lineitem")
        s.table(s"$db.q285_lineitem")
          .join(s.table(s"$db.q285_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            Relational.sumExact(
              Relational.revenue(col("l_extendedprice"), col("l_discount")),
              4).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderkey % 4 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q286: partition-pruned read ---------------------------------
    // The scan-cost half of layout: documents written
    // `partitionBy(lang)`, read back with a lang predicate — the scan
    // lists ONLY the matching directory (PartitionFilters in the plan,
    // pinned in Round6tSpec), so a 100 TB corpus filtered to one
    // language reads one language's bytes. The read-back aggregate
    // hash-matches the direct-filter oracle, proving the
    // write→prune→read cycle loses nothing.
    QueryDef("q286_partition_pruned_read",
      (s, d) => {
        val dir = s"${Scratch.dir(s, d)}/q286_docs"
        documents(s, d)
          .write.partitionBy("lang").mode("overwrite").parquet(dir)
        s.read.parquet(dir)
          .where(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
