package graft

import graft.ops.TxnLog
import graft.ops.TxnLog.Action
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors (the q586 library half): a delete
  * that rewrites NOTHING — one cumulative dv sidecar per touched
  * segment — must read exactly like its copy-on-write twin at every
  * version, survive checkpoint round-trips, supersede correctly,
  * vacuum its dead sidecars, and conflict with rewrites of its base
  * segment under OCC.
  */
class TxnMorSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_txn_mor")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def writeSeg(table: String, name: String, ids: Seq[Long]): String = {
    val p = s"$table/$name"
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
      .coalesce(1).write.parquet(p)
    p
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("MoR delete reads like CoW, rewrites nothing, time travel intact") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L, 3L, 4L))
    val b = writeSeg(t, "b", Seq(5L, 6L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.tryCommit(spark, t, 2L, "w", Seq(Action("add", b)))
    val res = TxnLog.deleteWhereMoR(spark, t, "mor", col("id").isin(2L, 4L))
    assert(res.exists(_.version == 3L))
    // per-segment targeting: only a matched, so exactly ONE dv action
    val c3 = TxnLog.commits(spark, t).last
    assert(c3.actions.map(_.kind) == Seq("dv"), s"wrong actions: $c3")
    assert(c3.actions.head.ref == a)
    // reader: rows gone, SEGMENTS unchanged (nothing rewritten)
    val (snap, v, nSegs) = TxnLog.snapshot(spark, t)
    assert(v == 3L && nSegs == 2)
    assert(ids(snap) == Seq(1L, 3L, 5L, 6L))
    assert(TxnLog.liveFiles(TxnLog.commits(spark, t)) == Seq(a, b),
      "a MoR delete must not change the live segment set")
    // time travel: v2 still shows the deleted rows
    assert(ids(TxnLog.snapshot(spark, t, Some(2L))._1) ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // no-op delete publishes no commit
    assert(TxnLog.deleteWhereMoR(spark, t, "mor", col("id") === 999L).isEmpty)
    assert(TxnLog.currentVersion(spark, t) == 3L)
  }

  test("second delete supersedes: cumulative sidecar, CDF emits the delta") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L, 3L, 4L, 5L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.deleteWhereMoR(spark, t, "mor", col("id") === 2L) // v2
    TxnLog.deleteWhereMoR(spark, t, "mor", col("id") === 4L) // v3
    assert(ids(TxnLog.snapshot(spark, t)._1) == Seq(1L, 3L, 5L))
    // exactly one ACTIVE dv for a, carrying BOTH deleted rows
    val state = TxnLog.liveState(TxnLog.commits(spark, t))
    assert(state.map(_._1) == Seq(a))
    val dv2 = state.head._2.get
    assert(ids(spark.read.parquet(dv2)) == Seq(2L, 4L))
    // CDF: each dv commit surfaces ONLY its delta, never the re-read
    // of the cumulative sidecar
    val (chg, _) = TxnLog.changeFeed(spark, t, 1L, 3L, Seq("id"))
    val del = chg.where(col("_change_type") === "delete")
      .select("id", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(del == Seq((2L, 2L), (4L, 3L)), s"wrong dv deltas: $del")
    assert(chg.count() == 2L)
  }

  test("checkpoint round-trips dv state; vacuum reaps superseded sidecars") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L, 3L, 4L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.deleteWhereMoR(spark, t, "mor", col("id") === 1L) // v2, dv1
    val dv1 = TxnLog.liveState(TxnLog.commits(spark, t)).head._2.get
    TxnLog.deleteWhereMoR(spark, t, "mor", col("id") === 3L) // v3, dv2
    TxnLog.writeCheckpoint(spark, t, 3L)
    // checkpoint-based resolution must reapply the ACTIVE dv
    val (snap, v, n, ckptV) = TxnLog.snapshotViaCheckpoint(spark, t)
    assert(v == 3L && ckptV == 3L && n == 1)
    assert(ids(snap) == Seq(2L, 4L))
    // vacuum at the head: dv1 (superseded at v3) is dead, dv2 active
    val vac = TxnLog.vacuum(spark, t, horizon = 3L)
    assert(vac.removed == Seq(dv1), s"wrong vacuum set: $vac")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dv1)))
    assert(ids(TxnLog.snapshot(spark, t)._1) == Seq(2L, 4L))
  }

  test("removing a dv'd segment: CDF deletes only still-visible rows; vacuum reaps the dv") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L, 3L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.deleteWhereMoR(spark, t, "mor", col("id") === 2L) // v2
    val dv = TxnLog.liveState(TxnLog.commits(spark, t)).head._2.get
    // v3 retires the segment outright
    TxnLog.tryCommit(spark, t, 3L, "w", Seq(Action("remove", a)))
    val (chg, _) = TxnLog.changeFeed(spark, t, 2L, 3L, Seq("id"))
    // id 2 was ALREADY deleted at v2 — it must not die twice
    assert(ids(chg.where(col("_change_type") === "delete")) == Seq(1L, 3L))
    // vacuum reaps segment AND its sidecar together
    val vac = TxnLog.vacuum(spark, t, horizon = 3L)
    assert(vac.removed.toSet == Set(a, dv), s"wrong vacuum set: $vac")
  }

  test("OCC: a MoR delete conflicts with a rewrite of its base segment") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L))
    val b = writeSeg(t, "b", Seq(3L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.tryCommit(spark, t, 2L, "w", Seq(Action("add", b)))
    // a compaction of a+b lands FIRST; a dv prepared against v2 must
    // abort (its base segment no longer exists), never commit blind
    val c = writeSeg(t, "c", Seq(1L, 2L, 3L))
    val dvPath = writeSeg(t, "_dv/stale", Seq(1L))
    TxnLog.tryCommit(spark, t, 3L, "compactor",
      Seq(Action("remove", a), Action("remove", b), Action("add", c)))
    val e = intercept[IllegalStateException] {
      TxnLog.commitWithRetry(spark, t, "mor",
        Seq(Action("dv", dvPath, ref = a)), baseVersion = Some(2L))
    }
    assert(e.getMessage.contains("conflicts"), e.getMessage)
    // disjoint-segment work still commutes: a dv on c rebases fine
    val dvC = writeSeg(t, "_dv/c1", Seq(3L))
    val res = TxnLog.commitWithRetry(spark, t, "mor",
      Seq(Action("dv", dvC, ref = c)), baseVersion = Some(3L))
    assert(res.version == 4L)
    assert(ids(TxnLog.snapshot(spark, t)._1) == Seq(1L, 2L))
  }
}
