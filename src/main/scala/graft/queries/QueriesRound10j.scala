package graft.queries

import graft.Tables._
import graft.ops.TxnLog
import graft.ops.TxnLog.Action
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 tenth batch: stats-in-the-log manifest pruning (q569) and
  * log-reconstructed table diffs (q570) — the last two read-side
  * capabilities of the table protocol.
  */
object QueriesRound10j {

  private def reset(s: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q569: manifest-level pruning (stats inside the commit log) ---------------
    // q541's zone maps still LIST and FOOTER-READ every segment; real
    // table formats put the per-segment column stats INSIDE the commit
    // actions, so planning touches only the log. The writer here
    // computes each price-band segment's (min, max) cents at write
    // time (an O(segments × stats-cols) driver pull — commit metadata
    // is driver-side by construction, the same class as the IVF
    // centroid pull) and commits them with the adds; the reader
    // resolves liveActions, prunes with NO file listing or footer
    // reads, and scans only intersecting segments. The oracle
    // recomputes the aggregate from the predicate and the pruning
    // arithmetic from the same band math — so the hash gate pins that
    // metadata-only pruning read EXACTLY the right rows.
    QueryDef("q569_manifest_pruning",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q569"
        reset(s, root)
        val base = orders(s, d).select(col("o_orderkey"),
          col("o_orderstatus").as("status"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .withColumn("band", expr("least(CAST(cents div 7500000 AS INT), 3)"))
        // write-time stats: the segment writer knows its own min/max
        // (TxnLog.segmentStats — the documented driver-side metadata
        // pull; queries/ stays collect-free)
        val stats = TxnLog.segmentStats(base, "band", Seq("cents"))
        (0 to 3).foreach { bnd =>
          // the oracle hard-pins 4 live segments, so an empty band at
          // an untested SF must fail LOUDLY here, not as a bare
          // NoSuchElementException out of the stats map
          val bandStats = stats.getOrElse(bnd, throw new IllegalStateException(
            s"q569: price band $bnd is empty at this scale factor — the " +
              "oracle pins 4 live segments, so all bands must be populated"))
          val p = s"$root/seg_band$bnd"
          base.where(col("band") === bnd).drop("band")
            .coalesce(1).write.parquet(p)
          require(TxnLog.tryCommit(s, root, bnd + 1L, "ingest",
            Seq(Action("add", p, bandStats))))
        }
        // reader: predicate cents ∈ [100$k, 180$k) — prune from the
        // LOG's stats alone (no listing, no footers)
        val (lo, hi) = (10000000L, 18000000L)
        val live = TxnLog.liveActions(TxnLog.commits(s, root))
        val chosen = live.filter(a => a.stats.get("cents")
          .exists { case (mn, mx) => mn < hi && mx >= lo })
        val agg = s.read.parquet(chosen.map(_.path): _*)
          .where(col("cents") >= lo && col("cents") < hi)
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        agg.select(col("n"), col("sum_cents"),
          lit(live.size).as("n_live_segments"),
          lit(chosen.size).as("n_read_segments"),
          lit(live.size - chosen.size).as("n_pruned_from_log"))
      },
      // bands are $75k wide (capped at band 3): [lo, hi) = [$100k,
      // $180k) intersects bands 1 and 2 only → 2 read, 2 pruned
      Some("""SELECT
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(4 AS INTEGER) AS n_live_segments,
        |  CAST(2 AS INTEGER) AS n_read_segments,
        |  CAST(2 AS INTEGER) AS n_pruned_from_log
        |FROM orders
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 10000000
        |  AND CAST(round(o_totalprice * 100) AS BIGINT) < 18000000""".stripMargin)),

    // ---- q570: table diff between versions, reconstructed from the log ------------
    // "What changed between v2 and v4?" answered from the log alone:
    // resolve both snapshots (time travel), anti-join row identities
    // both directions. On the shared history the compaction (v3)
    // rewrote bytes but not ROWS — the diff must show zero removals
    // and exactly the v4 append (keys ≡ 2 mod 4): the reader-visible
    // proof that compaction is invisible to consumers, which is the
    // entire point of the protocol.
    QueryDef("q570_txn_table_diff",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q570"
        QueriesRound10.buildHistory(s, d, root)
        val (v2, _, _) = TxnLog.snapshot(s, root, Some(2L))
        val (v4, _, _) = TxnLog.snapshot(s, root, Some(4L))
        val added = v4.join(v2.select("o_orderkey"), Seq("o_orderkey"),
          "left_anti")
        val removed = v2.join(v4.select("o_orderkey"), Seq("o_orderkey"),
          "left_anti")
        added.agg(count(lit(1)).as("n_added"),
            sum("cents").as("added_cents"))
          .crossJoin(removed.agg(count(lit(1)).as("n_removed")))
          .crossJoin(v4.agg(count(lit(1)).as("n_v4")))
          .crossJoin(v2.agg(count(lit(1)).as("n_v2")))
      },
      Some("""SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_orderkey % 4 = 2) AS n_added,
        |  (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |       AS BIGINT) FROM orders WHERE o_orderkey % 4 = 2)
        |    AS added_cents,
        |  CAST(0 AS BIGINT) AS n_removed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_orderkey % 4 IN (0, 1, 2)) AS n_v4,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |     WHERE o_orderkey % 4 IN (0, 1)) AS n_v2""".stripMargin))
  )
}
