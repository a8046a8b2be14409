package graft

import graft.ops.TxnLog
import graft.ops.TxnLog.Action
import org.apache.spark.sql.functions._

/** Pins the change-data-feed contract (q571-q573's library half):
  * per-commit classification, compaction netting to zero, equivalence
  * with the snapshot diff on a randomized history, and the plan-level
  * guarantee that the feed touches ONLY the segments the suffix
  * commits name.
  */
class TxnCdfSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_txn_cdf")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def writeSeg(table: String, name: String, ids: Seq[Long]): String = {
    val p = s"$table/$name"
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
      .coalesce(1).write.parquet(p)
    p
  }

  test("append commits are inserts; the feed's plan reads only named segments") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L))
    val b = writeSeg(t, "b", Seq(3L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.tryCommit(spark, t, 2L, "w", Seq(Action("add", b)))
    val (chg, opened) = TxnLog.changeFeed(spark, t, 1L, 2L, Seq("id"))
    assert(opened == 1)
    assert(chg.where(col("_change_type") === "insert").count() == 1L)
    assert(chg.where(col("_change_type") === "delete").count() == 0L)
    // the O(changed data) guarantee, at the PLAN level: segment a is
    // not part of any suffix commit and must not appear as an input
    assert(chg.inputFiles.forall(_.contains("/b/")),
      s"feed read outside the changed segments: ${chg.inputFiles.toSeq}")
  }

  test("a pure compaction nets to zero changes") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L))
    val b = writeSeg(t, "b", Seq(3L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.tryCommit(spark, t, 2L, "w", Seq(Action("add", b)))
    val c = writeSeg(t, "c", Seq(1L, 2L, 3L))
    TxnLog.tryCommit(spark, t, 3L, "compactor",
      Seq(Action("remove", a), Action("remove", b), Action("add", c)))
    val (chg, _) = TxnLog.changeFeed(spark, t, 2L, 3L, Seq("id"))
    assert(chg.count() == 0L, "compaction leaked row changes into the CDF")
  }

  test("rewrite commits surface exact row-level inserts and deletes") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L, 3L, 4L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    // copy-on-write update: drop 2 and 4, add 9 — one rewrite commit
    val a2 = writeSeg(t, "a2", Seq(1L, 3L, 9L))
    TxnLog.tryCommit(spark, t, 2L, "w",
      Seq(Action("remove", a), Action("add", a2)))
    val (chg, _) = TxnLog.changeFeed(spark, t, 1L, 2L, Seq("id"))
    val del = chg.where(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ins = chg.where(col("_change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(del == Seq(2L, 4L) && ins == Seq(9L),
      s"wrong row-level diff: del=$del ins=$ins")
  }

  test("copy-on-write update surfaces as update_pre/update_post pairs") {
    val t = freshTable()
    def writeKv(name: String, rows: Seq[(Long, Long)]): String = {
      val p = s"$t/$name"
      spark.createDataFrame(rows).toDF("id", "v")
        .coalesce(1).write.parquet(p)
      p
    }
    val a = writeKv("a", Seq(1L -> 10L, 2L -> 20L, 3L -> 30L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    // rewrite: id 2's payload changes, id 3 is deleted, id 9 appears
    val a2 = writeKv("a2", Seq(1L -> 10L, 2L -> 21L, 9L -> 90L))
    TxnLog.tryCommit(spark, t, 2L, "w",
      Seq(Action("remove", a), Action("add", a2)))
    val (chg, _) = TxnLog.changeFeed(spark, t, 1L, 2L, Seq("id"))
    def rows(tp: String) = chg.where(col("_change_type") === tp)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(rows("update_pre") == Seq(2L -> 20L), "old image of the update")
    assert(rows("update_post") == Seq(2L -> 21L), "new image of the update")
    assert(rows("delete") == Seq(3L -> 30L))
    assert(rows("insert") == Seq(9L -> 90L))
    // the unchanged row (id 1) must not appear at all
    assert(chg.count() == 4L)
  }

  test("property: CDF equals snapshot diff over randomized histories") {
    val rnd = new scala.util.Random(1111)
    for (trial <- 1 to 4) {
      val t = freshTable()
      var nextId = 100L
      var live = Set.empty[Long]
      var v = 0L
      // random add / merge-on-read delete / rewrite commits over a
      // growing id population — the rewrite branch also retires DV'd
      // segments, covering the remove-after-dv double-count hazard
      var i = 0
      while (i < 7) {
        i += 1
        val roll = rnd.nextInt(3)
        if (live.isEmpty || roll == 0) {
          v += 1
          val ids = (1 to (1 + rnd.nextInt(4))).map { _ =>
            nextId += 1; nextId
          }
          val p = writeSeg(t, s"s$v", ids)
          TxnLog.tryCommit(spark, t, v, "w", Seq(Action("add", p)))
          live ++= ids
        } else if (roll == 1) {
          // merge-on-read delete of a random subset: no rewrite, one
          // cumulative dv sidecar per touched segment
          val dropped = live.filter(_ => rnd.nextInt(10) < 3)
          TxnLog.deleteWhereMoR(spark, t, "mor",
            col("id").isin(dropped.toSeq: _*)) match {
            case Some(res) => v = res.version; live --= dropped
            case None => i -= 1 // nothing matched: no commit, retry
          }
        } else {
          // rewrite the WHOLE table: drop a random subset, add fresh ids
          v += 1
          val dropped = live.filter(_ => rnd.nextBoolean())
          val added = (1 to (1 + rnd.nextInt(3))).map { _ =>
            nextId += 1; nextId
          }.toSet
          val kept = live -- dropped
          val cs = TxnLog.commits(spark, t)
          val old = TxnLog.liveFiles(cs)
          val p = writeSeg(t, s"s$v", (kept ++ added).toSeq.sorted)
          TxnLog.tryCommit(spark, t, v, "w",
            old.map(Action("remove", _)) :+ Action("add", p))
          live = kept ++ added
        }
      }
      // pick a random interior range and compare both formulations
      val lo = 1L + rnd.nextInt(3)
      val (chg, _) = TxnLog.changeFeed(spark, t, lo, v, Seq("id"))
      val net = chg.groupBy("id").agg(
        sum(when(col("_change_type") === "insert", 1)
          .otherwise(-1)).as("net"))
      val cdfIns = net.where(col("net") > 0)
        .select("id").collect().map(_.getLong(0)).toSet
      val cdfDel = net.where(col("net") < 0)
        .select("id").collect().map(_.getLong(0)).toSet
      val (snapLo, _, _) = TxnLog.snapshot(spark, t, Some(lo))
      val (snapHi, _, _) = TxnLog.snapshot(spark, t, Some(v))
      val idsLo = snapLo.select("id").collect().map(_.getLong(0)).toSet
      val idsHi = snapHi.select("id").collect().map(_.getLong(0)).toSet
      assert(cdfIns == (idsHi -- idsLo),
        s"trial $trial range($lo,$v]: inserts ${cdfIns} != ${idsHi -- idsLo}")
      assert(cdfDel == (idsLo -- idsHi),
        s"trial $trial range($lo,$v]: deletes ${cdfDel} != ${idsLo -- idsHi}")
    }
  }
}
