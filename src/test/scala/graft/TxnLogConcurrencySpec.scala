package graft

import graft.ops.TxnLog
import graft.ops.TxnLog.Action

/** Real-thread concurrency over the commit protocol: q540 stages its
  * race deterministically; this spec runs an ACTUAL 8-writer race on
  * the rename primitive and pins the invariants that cannot be staged
  * — every writer lands, versions are distinct and contiguous, and
  * the total attempt count shows genuine contention. Plus a
  * randomized equivalence property: for arbitrary add/remove/ckpt
  * histories, checkpoint-based resolution equals full-log resolution
  * at every version.
  */
class TxnLogConcurrencySpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_txn_conc")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("8 threads racing commitWithRetry all land, versions contiguous") {
    val t = freshTable()
    // seed v1 so every racer starts from the same head
    val seed = s"$t/seg_seed"
    spark.range(1).coalesce(1).write.parquet(seed)
    assert(TxnLog.tryCommit(spark, t, 1L, "seed", Seq(Action("add", seed))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[TxnLog.CommitResult] {
          override def call(): TxnLog.CommitResult =
            TxnLog.commitWithRetry(spark, t, s"racer_$i",
              Seq(Action("add", s"$t/seg_$i")), maxAttempts = 64)
        })
      }
      val results = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      val versions = results.map(_.version).sorted
      assert(versions == (2L to 9L).toVector.sorted.toSeq.map(identity),
        s"writers did not land contiguous distinct versions: $versions")
      // contention really happened: with 8 racers from one head, the
      // attempt total must exceed one-each (at most one wins attempt 1
      // at each version, so the MINIMUM total for 8 writers is 8; any
      // real interleaving pushes it higher — require at least one retry)
      assert(results.map(_.attempts).sum >= 9,
        s"no contention observed: ${results.map(_.attempts)}")
      // the log itself is the ground truth: 9 contiguous commits,
      // every racer's segment live exactly once
      val cs = TxnLog.commits(spark, t)
      assert(cs.map(_.version) == (1L to 9L))
      val live = TxnLog.liveFiles(cs)
      assert(live.size == 9 && live.distinct.size == 9)
    } finally pool.shutdownNow()
  }

  test("property: checkpoint resolution equals full-log at every version") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 5) {
      val t = freshTable()
      var live = Set.empty[String]
      var nextSeg = 0
      var v = 0L
      val ckpts = scala.collection.mutable.ListBuffer.empty[Long]
      while (v < 12) {
        v += 1
        val actions =
          if (live.nonEmpty && rnd.nextInt(3) == 0) {
            // compaction: retire 1-2 live segments, add one
            val gone = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
            nextSeg += 1
            val add = s"seg_$nextSeg"
            live = live -- gone + add
            gone.map(Action("remove", _)) :+ Action("add", add)
          } else {
            nextSeg += 1
            val add = s"seg_$nextSeg"
            live = live + add
            Seq(Action("add", add))
          }
        assert(TxnLog.tryCommit(spark, t, v, "w", actions))
        if (rnd.nextInt(4) == 0) {
          TxnLog.writeCheckpoint(spark, t, v)
          ckpts += v
        }
      }
      // at every version, ckpt-based live set == full-fold live set
      val cs = TxnLog.commits(spark, t)
      (1L to 12L).foreach { asOf =>
        val full = TxnLog.liveFiles(cs.filter(_.version <= asOf)).toSet
        // checkpoint-based fold (the snapshotViaCheckpoint resolution,
        // replayed on the fold itself — segments here are names, not
        // readable parquet, so the scan step is out of scope)
        val ck = ckpts.filter(_ <= asOf).sorted.lastOption
        val viaFold = ck match {
          case Some(cv) =>
            val base = TxnLog.Commit(cv, "ckpt",
              TxnLog.liveFiles(cs.filter(_.version <= cv))
                .map(Action("add", _)))
            TxnLog.liveFiles(
              base +: cs.filter(c => c.version > cv && c.version <= asOf)).toSet
          case None => full
        }
        assert(viaFold == full,
          s"ckpt fold diverged at v$asOf: $viaFold vs $full")
      }
    }
  }

  test("8 overlapping writers: one winner per contested path, zero lost updates") {
    // the HIGHEST-contention mode of the OccProbe ledger, pinned as an
    // invariant: all 8 writers fight over the same 5 hot paths from a
    // pinned-stale base — exactly one writer may own each path, every
    // loser must abort with the named conflict error (never publish),
    // and every WINNER's action must survive into the final fold
    // (zero lost updates under maximum contention).
    val t = freshTable()
    val seed = s"$t/seg_seed"
    spark.range(1).coalesce(1).write.parquet(seed)
    assert(TxnLog.tryCommit(spark, t, 1L, "seed", Seq(Action("add", seed))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val landed = new java.util.concurrent.atomic.AtomicInteger(0)
    val aborted = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val futures = for (w <- 1 to 8; i <- 1 to 5) yield {
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              TxnLog.commitWithRetry(spark, t, s"racer_$w",
                Seq(Action("add", s"$t/hot_$i")), maxAttempts = 256,
                baseVersion = Some(1L))
              landed.incrementAndGet()
            } catch {
              case _: IllegalStateException => aborted.incrementAndGet()
            }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(landed.get == 5 && aborted.get == 35,
      s"expected one winner per hot path: landed=${landed.get} aborted=${aborted.get}")
    val cs = TxnLog.commits(spark, t)
    // contiguous log, exactly 6 commits (seed + 5 winners), and every
    // hot path live exactly once — no lost update, no double-publish
    assert(cs.map(_.version) == (1L to 6L))
    val live = TxnLog.liveFiles(cs)
    assert(live.toSet == (1 to 5).map(i => s"$t/hot_$i").toSet + seed,
      s"fold lost or duplicated a winner: $live")
  }
}
