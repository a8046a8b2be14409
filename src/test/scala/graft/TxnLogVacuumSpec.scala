package graft

import graft.ops.TxnLog
import graft.ops.TxnLog.Action

/** The vacuum lifecycle races q574 cannot stage with real concurrency:
  * a time-travel read at a RETAINED version must survive a vacuum that
  * runs between resolution and scan (the segments it references are
  * outside the removable set by construction); a read at a VACUUMED
  * version must fail with the protocol's named error — never a parquet
  * FileNotFound from mid-scan. Plus the checkpoint-every-N policy
  * (r10 verdict #2's operational half).
  */
class TxnLogVacuumSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_txn_vac")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private def writeSeg(table: String, name: String, ids: Seq[Long]): String = {
    val p = s"$table/$name"
    spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
      .coalesce(1).write.parquet(p)
    p
  }

  /** v1 add a, v2 add b, v3 compact a+b → c, v4 add d. */
  private def history(t: String): (String, String, String, String) = {
    val a = writeSeg(t, "a", Seq(1L))
    val b = writeSeg(t, "b", Seq(2L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    TxnLog.tryCommit(spark, t, 2L, "w", Seq(Action("add", b)))
    val c = writeSeg(t, "c", Seq(1L, 2L))
    TxnLog.tryCommit(spark, t, 3L, "w",
      Seq(Action("remove", a), Action("remove", b), Action("add", c)))
    val d = writeSeg(t, "d", Seq(9L))
    TxnLog.tryCommit(spark, t, 4L, "w", Seq(Action("add", d)))
    (a, b, c, d)
  }

  test("a read resolved at a retained version survives a concurrent vacuum") {
    val t = freshTable()
    val (a, b, _, _) = history(t)
    // reader resolves the RETAINED head (v4) — then vacuum runs before
    // the scan executes. v4's segments {c, d} are not removable, so
    // the late scan must still see exactly the post-compaction rows.
    val (snap, ver, _) = TxnLog.snapshot(spark, t)
    assert(ver == 4L)
    val res = TxnLog.vacuum(spark, t, horizon = 3L)
    assert(res.removed.toSet == Set(a, b), s"wrong removable set: $res")
    assert(snap.count() == 3L) // {1,2} from c, {9} from d — unharmed
    // and the files really are gone (execution, not planning)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(a)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(b)))
  }

  test("a read at a vacuumed version fails with the NAMED error, not FileNotFound") {
    val t = freshTable()
    history(t)
    TxnLog.vacuum(spark, t, horizon = 3L)
    // below the horizon: both resolution paths must throw the named
    // error at RESOLUTION time — before any parquet scan is planned
    val e = intercept[TxnLog.VersionVacuumedException] {
      TxnLog.snapshot(spark, t, Some(2L))
    }
    assert(e.getMessage.contains("vacuumed") && e.getMessage.contains("horizon"))
    intercept[TxnLog.VersionVacuumedException] {
      TxnLog.snapshotViaCheckpoint(spark, t, Some(1L))
    }
    // at and above the horizon: reads still work
    assert(TxnLog.snapshot(spark, t, Some(3L))._1.count() == 2L)
    assert(TxnLog.snapshot(spark, t, Some(4L))._1.count() == 3L)
  }

  test("vacuum races a true concurrent reader loop without a wrong answer") {
    val t = freshTable()
    history(t)
    // reader thread hammers latest-version snapshots while vacuum runs:
    // every successfully-resolved read must return the exact live rows
    // (never a partial table, never a vacuumed-file crash at latest)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        val (snap, ver, _) = TxnLog.snapshot(spark, t)
        val n = snap.count()
        if (ver == 4L && n != 3L)
          errors.add(s"latest read saw $n rows at v$ver")
      }
    })
    reader.start()
    try {
      Thread.sleep(150) // let the reader spin first
      TxnLog.vacuum(spark, t, horizon = 4L) // removes a and b
    } finally {
      stop.set(true); reader.join(30000)
    }
    assert(errors.isEmpty, s"racing reader saw: $errors")
    assert(TxnLog.snapshot(spark, t)._1.count() == 3L)
  }

  test("log retention: truncation deletes folded bodies, reads anchor at the floor") {
    val t = freshTable()
    (1 to 25).foreach { i =>
      val p = writeSeg(t, s"s$i", Seq(i.toLong))
      TxnLog.tryCommit(spark, t, i.toLong, "w", Seq(Action("add", p)))
      TxnLog.checkpointIfDue(spark, t, every = 10)
    }
    val res = TxnLog.truncateLog(spark, t)
    assert(res.floor == 20L && res.deletedCommits == 20)
    // bodies 1..20 physically gone; 21..25 remain
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(t, "_txnlog"))
      .map(_.getPath.getName).filter(_.endsWith(".txn"))
      .map(_.stripSuffix(".txn").toLong).sorted.toSeq
    assert(left == (21L to 25L), s"wrong survivors: $left")
    // head and reads at/above the floor are unaffected
    assert(TxnLog.currentVersion(spark, t) == 25L)
    assert(TxnLog.snapshot(spark, t)._1.count() == 25L)
    assert(TxnLog.snapshot(spark, t, Some(22L))._1.count() == 22L)
    assert(TxnLog.snapshot(spark, t, Some(20L))._1.count() == 20L) // = floor
    // below the floor: the NAMED retention error, on both paths
    intercept[TxnLog.LogTruncatedException] {
      TxnLog.snapshot(spark, t, Some(19L))
    }
    intercept[TxnLog.LogTruncatedException] {
      TxnLog.snapshotViaCheckpoint(spark, t, Some(19L))
    }
    // a full-log fold no longer exists — refuse loudly, never return a
    // silently-partial commit list
    intercept[TxnLog.LogTruncatedException] { TxnLog.commits(spark, t) }
    // a CDF range reaching below the floor refuses too; one above works
    intercept[TxnLog.LogTruncatedException] {
      TxnLog.changeFeed(spark, t, 5L, 25L, Seq("id"))
    }
    assert(TxnLog.changeFeed(spark, t, 20L, 25L, Seq("id"))._1.count() == 5L)
    // life goes on: new commits land, the NEXT checkpoint folds from
    // the anchor, and a second truncation advances the floor
    (26 to 30).foreach { i =>
      val p = writeSeg(t, s"s$i", Seq(i.toLong))
      TxnLog.tryCommit(spark, t, i.toLong, "w", Seq(Action("add", p)))
      TxnLog.checkpointIfDue(spark, t, every = 10)
    }
    assert(TxnLog.snapshot(spark, t)._1.count() == 30L)
    val res2 = TxnLog.truncateLog(spark, t)
    assert(res2.floor == 30L && res2.deletedCommits == 10)
    // fully-truncated edge: zero .txn files — the checkpoint IS the head
    assert(TxnLog.currentVersion(spark, t) == 30L)
    assert(TxnLog.snapshot(spark, t)._1.count() == 30L)
    // and the table still accepts commits after full truncation
    val p31 = writeSeg(t, "s31", Seq(31L))
    assert(TxnLog.tryCommit(spark, t, 31L, "w", Seq(Action("add", p31))))
    assert(TxnLog.snapshot(spark, t)._1.count() == 31L)
  }

  test("fully-truncated log: full-log folds refuse, reads and writes still work") {
    val t = freshTable()
    (1 to 5).foreach { i =>
      val p = writeSeg(t, s"s$i", Seq(i.toLong))
      TxnLog.tryCommit(spark, t, i.toLong, "w", Seq(Action("add", p)))
    }
    TxnLog.writeCheckpoint(spark, t, 5L)
    val res = TxnLog.truncateLog(spark, t)
    assert(res.floor == 5L && res.deletedCommits == 5)
    // ZERO .txn files left: a plain commits() fold would silently
    // report an empty table — it must throw the named error instead
    // (the review finding: the empty-listing exit ran before the
    // floor guard)
    intercept[TxnLog.LogTruncatedException] { TxnLog.commits(spark, t) }
    assert(TxnLog.currentVersion(spark, t) == 5L)
    assert(TxnLog.snapshot(spark, t)._1.count() == 5L)
    val p6 = writeSeg(t, "s6", Seq(6L))
    assert(TxnLog.commitWithRetry(spark, t, "w",
      Seq(Action("add", p6))).version == 6L)
    assert(TxnLog.snapshot(spark, t)._1.count() == 6L)
  }

  test("truncation refuses while removed segments await vacuum (no orphans)") {
    val t = freshTable()
    val a = writeSeg(t, "a", Seq(1L, 2L))
    TxnLog.tryCommit(spark, t, 1L, "w", Seq(Action("add", a)))
    // copy-on-write rewrite retires a — its remove action is now the
    // ONLY record that a is deletable
    val a2 = writeSeg(t, "a2", Seq(1L))
    TxnLog.tryCommit(spark, t, 2L, "w",
      Seq(Action("remove", a), Action("add", a2)))
    TxnLog.writeCheckpoint(spark, t, 2L)
    // truncating now would orphan a forever: refuse with a clear error
    val e = intercept[IllegalArgumentException] { TxnLog.truncateLog(spark, t) }
    assert(e.getMessage.contains("not yet vacuumed"))
    // vacuum first, then truncation proceeds
    val vac = TxnLog.vacuum(spark, t, horizon = 2L)
    assert(vac.removed == Seq(a))
    val res = TxnLog.truncateLog(spark, t)
    assert(res.floor == 2L && res.deletedCommits == 2)
    assert(TxnLog.snapshot(spark, t)._1.count() == 1L)
  }

  test("remove AFTER truncation stays visible to vacuum past a newer checkpoint") {
    // the r11 hole: on a truncated log, vacuum and the truncation
    // orphan guard anchored their fold at the NEWEST checkpoint — but
    // a checkpoint folds removes AWAY, so a remove landing in
    // (floor, newestCkpt] became invisible: vacuum silently never
    // deleted the segment, the guard passed anyway, and the next
    // truncation deleted the only remove record — a permanent orphan
    // and a silently broken hard-purge. The fold must anchor at the
    // FLOOR checkpoint (every body above the floor exists).
    val t = freshTable()
    val (_, _, c, d) = history(t)
    TxnLog.writeCheckpoint(spark, t, 4L)
    TxnLog.vacuum(spark, t, horizon = 4L) // clears the v3 compaction's a+b
    assert(TxnLog.truncateLog(spark, t).floor == 4L)
    // CoW delete ABOVE the floor: v5 rewrites d → e (remove at v5)
    val e5 = writeSeg(t, "e", Seq(7L))
    TxnLog.tryCommit(spark, t, 5L, "w",
      Seq(Action("remove", d), Action("add", e5)))
    // a NEWER checkpoint lands above the floor and folds the remove away
    assert(TxnLog.checkpointIfDue(spark, t, every = 1).contains(5L))
    // truncating now must REFUSE: d is removed-but-unvacuumed
    val refuse = intercept[IllegalArgumentException] {
      TxnLog.truncateLog(spark, t)
    }
    assert(refuse.getMessage.contains("not yet vacuumed"),
      s"guard blind to the post-truncation remove: ${refuse.getMessage}")
    // and vacuum must SEE the remove despite the newer checkpoint
    val vac = TxnLog.vacuum(spark, t, horizon = 5L)
    assert(vac.removed == Seq(d), s"vacuum blind past the floor: $vac")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(d)), "d leaked")
    // now truncation proceeds and the surviving table is intact
    assert(TxnLog.truncateLog(spark, t).floor == 5L)
    val (snap, ver, _) = TxnLog.snapshot(spark, t)
    assert(ver == 5L && snap.count() == 3L) // {1,2} from c + {7} from e
    assert(fs.exists(new org.apache.hadoop.fs.Path(c)))
  }

  test("checkpoint-every-N policy: due exactly every N commits, resolution O(N)") {
    val t = freshTable()
    val every = 10
    var written = List.empty[Long]
    (1 to 25).foreach { i =>
      val p = writeSeg(t, s"s$i", Seq(i.toLong))
      TxnLog.tryCommit(spark, t, i.toLong, "w", Seq(Action("add", p)))
      TxnLog.checkpointIfDue(spark, t, every).foreach(v => written ::= v)
    }
    assert(written.reverse == List(10L, 20L),
      s"checkpoints at wrong versions: ${written.reverse}")
    val (snap, ver, n, ckptV) = TxnLog.snapshotViaCheckpoint(spark, t)
    assert(ver == 25L && ckptV == 20L && n == 25)
    assert(snap.count() == 25L)
    // the policy's point: resolution past the checkpoint opens only the
    // suffix — corrupt every pre-checkpoint body and it must not notice
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 20).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(
        s"$t/_txnlog/${"%020d".format(v)}.txn")
      val out = fs.create(p, true)
      out.write("garbage".getBytes("UTF-8")); out.close()
    }
    val (snap2, ver2, _, ckptV2) = TxnLog.snapshotViaCheckpoint(spark, t)
    assert(ver2 == 25L && ckptV2 == 20L && snap2.count() == 25L)
  }
}
