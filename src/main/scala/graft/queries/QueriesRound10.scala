package graft.queries

import graft.Tables._
import graft.ops.TxnLog
import graft.ops.TxnLog.Action
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 first batch: the transaction-log table lane (r9 verdict
  * #3). The engine had every lakehouse ingredient (MERGE q163, SCD2
  * q100, snapshot diff q246, changelog idempotence q409, compaction
  * q174) but no ACID commit protocol binding them; [[graft.ops.TxnLog]]
  * adds the log itself and these lanes prove it end to end: the
  * SPARK side builds a real on-disk table (immutable parquet segments
  * + atomically-published commit files), drives append / compact /
  * concurrent-writer traffic through the protocol, and reads results
  * back ONLY by resolving the log; the ORACLE recomputes the expected
  * table state directly from the source rows plus the protocol's
  * deterministic version/segment/attempt arithmetic — so a hash match
  * proves the log fold reconstructed exactly the right data.
  */
object QueriesRound10 {

  private def reset(s: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Deterministic base projection: one row per order, money in exact
    * cents. Segment membership is a pure function of the key (mod 4),
    * so both engines can name any segment's rows with a predicate. */
  private def base(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderkey"),
      col("o_orderstatus").as("status"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))

  /** Build the shared 4-commit history under `root`:
    * v1 add seg_a (keys ≡ 0 mod 4), v2 add seg_b (≡ 1),
    * v3 compact a+b → seg_c, v4 add seg_d (≡ 2).
    * Returns the segment paths (a, b, c, d). A real pipeline writes
    * each segment once as data arrives; the three mod-filtered writes
    * here are the test harness, not the protocol's cost. */
  private[queries] def buildHistory(s: SparkSession, d: String,
                           root: String): (String, String, String, String) = {
    reset(s, root)
    def seg(name: String, m: Int): String = {
      val p = s"$root/$name"
      base(s, d).where(col("o_orderkey") % 4 === m)
        .coalesce(1).write.parquet(p)
      p
    }
    val a = seg("seg_a", 0)
    require(TxnLog.tryCommit(s, root, 1L, "ingest", Seq(Action("add", a))))
    val b = seg("seg_b", 1)
    require(TxnLog.tryCommit(s, root, 2L, "ingest", Seq(Action("add", b))))
    // compaction: rewrite the two small segments as one, retire both
    // in the SAME commit — readers never see a state with the rows
    // duplicated or missing
    val c = s"$root/seg_c"
    s.read.parquet(a, b).coalesce(1).write.parquet(c)
    require(TxnLog.tryCommit(s, root, 3L, "compactor",
      Seq(Action("remove", a), Action("remove", b), Action("add", c))))
    val dd = seg("seg_d", 2)
    require(TxnLog.tryCommit(s, root, 4L, "ingest", Seq(Action("add", dd))))
    (a, b, c, dd)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q538: snapshot read through the commit log -----------------------------
    // Latest-version read: resolve the log (4 commits, one of them a
    // compaction), scan only the live segments. Live set must be
    // {seg_c, seg_d} = keys ≡ 0,1,2 (mod 4) — the compaction retired
    // a and b without changing the data. The oracle computes the same
    // aggregate straight from `orders` with the membership predicate,
    // so the hash gate verifies the fold: had the reader double-read
    // a compacted segment (or missed one), every group's count and
    // cent-sum would shift.
    QueryDef("q538_txn_snapshot",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q538"
        buildHistory(s, d, root)
        val (snap, ver, nSegs) = TxnLog.snapshot(s, root)
        snap.groupBy("status").agg(
          count(lit(1)).as("n"),
          sum("cents").as("sum_cents"))
          .withColumn("version", lit(ver))
          .withColumn("n_segments", lit(nSegs))
          .orderBy("status")
      },
      Some("""SELECT o_orderstatus AS status,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(4 AS BIGINT) AS version, CAST(2 AS INTEGER) AS n_segments
        |FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q539: time travel — read the table as of an old version ----------------
    // Same 4-commit history; one row per (as_of 2, as_of 4) snapshot
    // in a single frame. Version 2 predates BOTH the compaction and
    // the seg_d append, so its live set is {seg_a, seg_b} (keys ≡ 0,1)
    // — time travel must resurrect the RETIRED segments, which only
    // works because commits remove segments from the live set without
    // deleting the immutable files. Version 4 shows the post-compact
    // state from the identical log. The oracle recomputes both
    // snapshots' aggregates from the membership predicates.
    QueryDef("q539_txn_time_travel",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q539"
        buildHistory(s, d, root)
        def row(asOf: Long): DataFrame = {
          val (snap, ver, nSegs) = TxnLog.snapshot(s, root, Some(asOf))
          snap.agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
            .select(lit(ver).as("as_of"), col("n"), col("sum_cents"),
              lit(nSegs).as("n_segments"))
        }
        row(2L).unionAll(row(4L)).orderBy("as_of")
      },
      Some("""SELECT CAST(2 AS BIGINT) AS as_of,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(2 AS INTEGER) AS n_segments
        |FROM orders WHERE o_orderkey % 4 IN (0, 1)
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
        |  CAST(2 AS INTEGER)
        |FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
        |ORDER BY as_of""".stripMargin)),

    // ---- q540: concurrent writers — one must lose, loser rebases ----------------
    // The optimistic-concurrency story on one table: from base v4, a
    // compactor and an appender both target v5. The compactor
    // publishes first (attempts=1). The appender — holding the STALE
    // base — loses the v5 rename race (pinned: tryCommit returns
    // false), conflict-checks its add-only action set against the
    // intervening compaction (disjoint paths → commutes), rebases, and
    // wins v6 on its second attempt. A rival compactor then tries to
    // retire seg_c — already removed by v5 — and must ABORT (true
    // conflict). Final state: 6 commits, live = {seg_e, seg_f} = ALL
    // orders. The oracle recomputes the full-table aggregate plus the
    // protocol's deterministic version/attempt/abort arithmetic.
    QueryDef("q540_txn_conflict",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q540"
        val (_, _, c, dd) = buildHistory(s, d, root)
        val staleBase = TxnLog.currentVersion(s, root) // 4: both writers read this
        // appender stages its segment BEFORE the compactor commits —
        // the classic read-prepare-publish race window
        val f = s"$root/seg_f"
        base(s, d).where(col("o_orderkey") % 4 === 3)
          .coalesce(1).write.parquet(f)
        // compactor: rewrite c+d as one segment, wins v5 uncontended
        val e = s"$root/seg_e"
        s.read.parquet(c, dd).coalesce(1).write.parquet(e)
        val rc = TxnLog.commitWithRetry(s, root, "compactor",
          Seq(Action("remove", c), Action("remove", dd), Action("add", e)))
        // appender publishes from the stale base: v5 rename must fail…
        val lostRace = TxnLog.tryCommit(s, root, staleBase + 1, "appender",
          Seq(Action("add", f)))
        // …then the OCC loop (seeded at the same stale base) loses
        // attempt 1, finds the intervening compaction disjoint from
        // its add-only set, rebases, and wins v6 on attempt 2
        val ra = TxnLog.commitWithRetry(s, root, "appender",
          Seq(Action("add", f)), maxAttempts = 10, baseVersion = Some(staleBase))
        // rival compactor: seg_c is gone — a TRUE conflict, must abort
        val rivalAborted =
          try {
            TxnLog.commitWithRetry(s, root, "rival",
              Seq(Action("remove", c), Action("add", s"$root/seg_g")),
              baseVersion = Some(staleBase))
            false
          } catch { case _: IllegalStateException => true }
        val (snap, ver, nSegs) = TxnLog.snapshot(s, root)
        snap.agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(col("n"), col("sum_cents"),
            lit(ver).as("final_version"),
            lit(rc.version).as("compactor_version"),
            lit(rc.attempts).as("compactor_attempts"),
            lit(lostRace).as("appender_won_race"),
            lit(ra.version).as("appender_version"),
            lit(ra.attempts).as("appender_attempts"),
            lit(rivalAborted).as("rival_aborted"),
            lit(nSegs).as("n_segments"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(6 AS BIGINT) AS final_version,
        |  CAST(5 AS BIGINT) AS compactor_version,
        |  CAST(1 AS INTEGER) AS compactor_attempts,
        |  false AS appender_won_race,
        |  CAST(6 AS BIGINT) AS appender_version,
        |  CAST(2 AS INTEGER) AS appender_attempts,
        |  true AS rival_aborted,
        |  CAST(2 AS INTEGER) AS n_segments
        |FROM orders""".stripMargin)),

    // ---- q549: ANALYZE-fed broadcast planning ------------------------------------
    // The consumer of q395's statistics ledger (r9 verdict #8): the
    // lane runs ANALYZE (exact row count + NDVs, one scan), registers
    // the stats in the StatsLedger, and joins lineitem against a
    // brand-sliced part dimension — the shape where Catalyst's
    // size-only estimator can't see the slice (Filter keeps the
    // child's sizeInBytes) but the measured NDV math can, so
    // plans/StatsBroadcastJoin may hint the broadcast side
    // pre-shuffle (saving the fact side's exchange WRITE, which AQE's
    // late conversion still pays — the 100 TB argument; plan flip
    // pinned in StatsBroadcastSpec). The hash gate verifies BOTH the
    // join result AND the ANALYZE computation itself (dim_rows,
    // ndv_brand ride as columns).
    QueryDef("q549_stats_fed_join",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val dim = part(s, d)
        val key = graft.plans.StatsBroadcastJoin.pathKeyOf(dim)
          .getOrElse(s"$d/part.parquet")
        val st = graft.ops.Relational.analyzeForCbo(dim, key,
          Seq("p_brand", "p_partkey"))
        val sliced = dim.where(col("p_brand") === "Brand#19")
          .select(col("p_partkey"))
        lineitem(s, d)
          .join(sliced, col("l_partkey") === col("p_partkey"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
              .as("sum_cents"))
          .select(col("n"), col("sum_cents"),
            lit(st.rows).as("dim_rows"),
            lit(st.ndv("p_brand")).as("ndv_brand"))
      },
      Some("""SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     JOIN part ON l_partkey = p_partkey
        |     WHERE p_brand = 'Brand#19') AS n,
        |  (SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |       AS BIGINT) FROM lineitem
        |     JOIN part ON l_partkey = p_partkey
        |     WHERE p_brand = 'Brand#19') AS sum_cents,
        |  (SELECT CAST(count(*) AS BIGINT) FROM part) AS dim_rows,
        |  (SELECT CAST(count(DISTINCT p_brand) AS BIGINT) FROM part)
        |    AS ndv_brand""".stripMargin))
  )
}
