package graft.ops

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mini-lakehouse transaction log: ACID table commits as an ordered
  * sequence of atomically-published log files, the protocol behind
  * every modern table format (public designs: the Delta Lake VLDB'20
  * paper, the Iceberg spec, Hive ACID). The reference's
  * `last_run.json` overwrite (reference `main.py:19-22`) is the
  * degenerate single-writer case of exactly this — one state file,
  * last writer wins; this is the multi-writer generalization SURVEY
  * §2A maps to "checkpoint/commit-log".
  *
  * Design (all public-knowledge techniques):
  * - A table is a directory of immutable parquet segments plus
  *   `_txnlog/<version 20-digit zero-padded>.txn` commit files.
  * - Each commit lists `add`/`remove` segment actions. The LIVE set at
  *   version v is the ordered fold of actions ≤ v (adds insert,
  *   removes delete) — so compaction, append, and delete are all just
  *   commits, and any historical snapshot is reconstructible (time
  *   travel).
  * - **Optimistic concurrency**: a writer prepares its segments, then
  *   publishes `<v>.txn` via write-to-temp + a CREATION-EXCLUSIVE
  *   publish — hard link (`link(2)`, atomic EEXIST) on POSIX local
  *   filesystems, [[FileContext]] rename-without-overwrite on HDFS
  *   (atomic at the NameNode), a conditional PUT on object stores —
  *   the per-store LogStore strategy public table formats document.
  *   Exactly one writer can own a version; the loser re-reads the
  *   log, checks its action set against the intervening commits, and
  *   either rebases to the new head or aborts.
  * - **Snapshot isolation**: a reader lists the log ONCE, resolves the
  *   live set at the version it saw, and reads only those immutable
  *   segments — concurrent commits create new versions, never mutate
  *   segments, so the read is consistent without locks.
  * - Contiguity rule: versions start at 1 and must be gap-free; a
  *   reader stops at the first gap (a gap can only be a not-yet-
  *   visible in-flight publish on an eventually-listing store).
  *
  * At 100 TB the log is O(commits), not O(data): resolving it is a
  * driver-side listing of tiny files (checkpoint/compaction of the log
  * itself would follow the same public designs), while the data reads
  * stay fully distributed over the resolved segment list. On object
  * stores without atomic rename the publish step swaps to a
  * conditional PUT / external lock service — same protocol, different
  * primitive (the Delta paper's LogStore abstraction).
  */
object TxnLog {

  /** One file-level action inside a commit. `kind` ∈ add | remove |
    * dv. `stats` optionally carries the segment's column zone maps
    * (name → (min, max) as longs) INSIDE the commit — so a reader can
    * prune segments from the LOG ALONE, without listing or opening a
    * single data file (manifest-level pruning, the public
    * Iceberg/Delta stats-in-metadata design).
    *
    * `dv` is the MERGE-ON-READ delete (the public deletion-vector
    * design): `path` is a parquet sidecar holding the CUMULATIVE
    * deleted rows of the base segment named by `ref` — the segment is
    * NOT rewritten; readers subtract the sidecar at scan time. A newer
    * dv on the same segment SUPERSEDES the older one (each dv carries
    * the full deleted-row set, so the active state is one sidecar per
    * segment, never a chain). Zone-map stats on the base add remain
    * valid BOUNDS under row deletes (deletes only shrink a segment's
    * min/max range, never widen it). */
  case class Action(kind: String, path: String,
                    stats: Map[String, (Long, Long)] = Map.empty,
                    ref: String = "")

  case class Commit(version: Long, writer: String, actions: Seq[Action])

  /** Outcome of [[commitWithRetry]]: the version finally owned plus
    * how many publish attempts it took (1 = no contention). */
  case class CommitResult(version: Long, attempts: Int)

  /** Abort outcome of [[commitWithRetry]] — a true path conflict or
    * attempt exhaustion. Carries the REAL publish count so a
    * contention probe can account every tryCommit the loser burned
    * before detecting the conflict (an aborted writer may have lost
    * several version races first; counting it as one undercounts the
    * contention tax). Subclasses IllegalStateException so existing
    * abort handling is unchanged. */
  class CommitConflictException(msg: String, val attempts: Int)
    extends IllegalStateException(msg)

  private def logDir(table: String) = new Path(table, "_txnlog")

  private def versionFile(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.txn")

  private def hfs(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Process-unique staging counter — see the tmp-file naming note in
    * [[tryCommit]]. */
  private val stagingSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Attempt to publish `actions` as exactly `version`. Returns true
    * iff this writer won the version. Never throws on contention —
    * losing the rename race is a normal protocol outcome. */
  def tryCommit(s: SparkSession, table: String, version: Long,
                writer: String, actions: Seq[Action]): Boolean = {
    require(version >= 1, s"versions start at 1, got $version")
    // the commit-file format is delimiter-framed (\t between fields,
    // \n between actions, ,/: inside the stats blob) with NO escaping
    // — a path or column name carrying a delimiter would serialize
    // fine and corrupt the log at PARSE time, making the whole table
    // unreadable. Reject at the write boundary instead: segment paths
    // and stats column names are producer-controlled (not data), so a
    // hard error here costs nothing and a torn log costs everything.
    actions.foreach { a =>
      require(!a.path.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"segment path contains a log delimiter (tab/newline): '${a.path}'")
      require(!a.ref.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"dv base-segment path contains a log delimiter: '${a.ref}'")
      require(a.ref.isEmpty || a.kind == "dv",
        s"ref is only meaningful on dv actions, got '${a.kind}'")
      require(a.kind != "dv" || a.ref.nonEmpty,
        "a dv action must name its base segment via ref")
      a.stats.keys.foreach(c =>
        require(!c.exists(ch => ":,\t\n\r".contains(ch)),
          s"stats column name contains a log delimiter (:,\\t): '$c'"))
    }
    val dir = logDir(table)
    val fs = hfs(s, dir)
    fs.mkdirs(dir)
    val target = versionFile(table, version)
    if (fs.exists(target)) return false // fast-path: already owned
    // stage the full commit body in an INVOCATION-private temp file so
    // a crash mid-write can never leave a torn <v>.txn visible. The
    // name carries a process-unique counter, not just (writer,
    // version): two concurrent commits under the SAME writer id
    // otherwise share a staging path — one deletes it while the other
    // links, and the publish dies on NoSuchFile instead of losing the
    // race cleanly (found by the 8-overlapping-writers spec).
    val tmp = new Path(dir,
      s"_tmp_${writer}_${version}_${stagingSeq.incrementAndGet()}.txn")
    val out = fs.create(tmp, true)
    try {
      val body = (s"commit\t$version\t$writer" +:
        actions.map { a =>
          val st =
            if (a.stats.isEmpty) ""
            else a.stats.toSeq.sortBy(_._1)
              .map { case (c, (lo, hi)) => s"$c:$lo:$hi" }
              .mkString("\t", ",", "")
          // ref is field 4 — an empty stats field holds its slot so
          // old parsers (≤3 fields) and new lines stay one format
          val rf =
            if (a.ref.isEmpty) ""
            else (if (a.stats.isEmpty) "\t\t" else "\t") + a.ref
          s"${a.kind}\t${a.path}$st$rf"
        }).mkString("", "\n", "\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    // the atomic publish: a creation-exclusive primitive per store
    // (the LogStore-per-filesystem strategy every public table format
    // documents). On POSIX local FS that is hard link — link(2) fails
    // with EEXIST and never overwrites; FileContext.rename(NONE) is
    // NOT safe here because its default implementation is
    // check-then-rename (TOCTOU) and the checksum wrapper renames
    // data + crc as TWO renames, so two racing publishers can
    // interleave into B's bytes under A's crc (found by the 8-writer
    // race in TxnLogConcurrencySpec). On HDFS the NameNode makes
    // rename-without-overwrite a single atomic op, so it stays the
    // publish there; object stores would swap in a conditional PUT.
    val won = fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      case _ =>
        // rename-without-overwrite is only creation-exclusive where a
        // central authority serializes it (the HDFS NameNode). On an
        // object store (s3a, gs, abfs…) rename is copy+delete with no
        // exclusivity — two racing publishers could BOTH "succeed" and
        // silently violate one-winner-per-version. Fail fast there
        // instead of corrupting the log: those stores need a
        // conditional-PUT LogStore (the Delta paper's per-store
        // strategy), which this sandbox cannot exercise.
        val scheme = target.toUri.getScheme
        if (scheme != "hdfs" && scheme != "viewfs")
          throw new UnsupportedOperationException(
            s"TxnLog publish on scheme '$scheme' is not atomic: " +
              "rename-without-overwrite is only creation-exclusive on " +
              "HDFS; this store needs a conditional-PUT LogStore")
        val fc = FileContext.getFileContext(target.toUri,
          s.sparkContext.hadoopConfiguration)
        try { fc.rename(tmp, target, Options.Rename.NONE); true }
        catch {
          // ONLY already-exists means we lost the race. Any other
          // IOException is a real failure (network, quota, auth) —
          // swallowing it as `false` would send commitWithRetry into a
          // rebase spin against an unchanged head and end in a
          // misleading "gave up after N attempts".
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
        }
    }
    // staging file (and its checksum sidecar) is no longer needed on
    // either path: the link carries the data; no .crc ever follows it,
    // so no torn data/crc pair can exist for a published commit
    fs.delete(tmp, false)
    won
  }

  /** ONE directory listing's view of the log — every resolution path
    * derives all its decisions (floor, head, vacuum horizon, commit
    * set) from a single [[logState]] call, so one read cannot mix two
    * log states (the listing IS the snapshot-isolation boundary).
    *
    * floor: 0 = full history; F > 0 = commit bodies 1..F were
    * retention-deleted ([[truncateLog]]) and the checkpoint at F is
    * the only anchor — reads below F are impossible. A listing whose
    * first txn is v > 1 WITHOUT a checkpoint at v-1 is a gap (an
    * in-flight publish on an eventually-listing store), not a
    * truncation.
    *
    * head: highest contiguous committed version, anchored at the
    * floor — a property of file NAMES alone, no body reads. */
  private case class LogState(txns: Seq[(Long, Path)], ckpts: Seq[Long],
                              vacHorizon: Long) {
    lazy val floor: Long = txns.headOption match {
      case Some((v, _)) if v > 1L && ckpts.contains(v - 1L) => v - 1L
      case Some(_) => 0L
      case None => ckpts.lastOption.getOrElse(0L)
    }
    lazy val head: Long = {
      if (txns.isEmpty) floor // fully-truncated: the ckpt IS the head
      else if (txns.head._1 > 1L && floor == 0L) 0L // listing gap
      else txns.map(_._1).zipWithIndex
        .takeWhile { case (v, i) => v == floor + 1L + i }
        .lastOption.map(_._1).getOrElse(floor)
    }
  }

  private def logState(s: SparkSession, table: String): LogState = {
    val dir = logDir(table)
    val fs = hfs(s, dir)
    if (!fs.exists(dir)) return LogState(Seq.empty, Seq.empty, 0L)
    val names = fs.listStatus(dir).map(_.getPath)
    LogState(
      names.filter(_.getName.matches("\\d{20}\\.txn"))
        .map(p => p.getName.stripSuffix(".txn").toLong -> p)
        .sortBy(_._1).toSeq,
      names.map(_.getName).filter(_.matches("\\d{20}\\.ckpt"))
        .map(_.stripSuffix(".ckpt").toLong).sorted.toSeq,
      names.map(_.getName).filter(_.matches("_vacuum_\\d{20}\\.mark"))
        .map(_.stripPrefix("_vacuum_").stripSuffix(".mark").toLong)
        .foldLeft(0L)(math.max))
  }

  def logFloor(s: SparkSession, table: String): Long =
    logState(s, table).floor

  /** Read at a version whose commit history was retention-deleted:
    * the named failure mode of [[truncateLog]] — distinct from
    * [[VersionVacuumedException]] (there the DATA is gone; here the
    * LOG below the floor is). */
  class LogTruncatedException(table: String, requested: Long, floor: Long)
    extends RuntimeException(
      s"version $requested of $table is below the log's history floor " +
        s"$floor: commits 1..$floor were retention-deleted and survive " +
        s"only as the checkpoint at $floor — read at or above it")

  /** Read the commit log up to (and including) `asOf`, in version
    * order, stopping at the first gap (contiguity rule above). One
    * listing = one consistent snapshot of the log.
    *
    * `fromVersion` is the checkpoint lower bound: versions ≤ it are
    * verified present in the LISTING (contiguity still holds) but
    * their bodies are never opened — that is what makes the
    * checkpoint read path O(suffix) instead of O(all commits). A
    * year-old table with a checkpoint reads two tiny files, not ten
    * thousand. */
  def commits(s: SparkSession, table: String,
              asOf: Option[Long] = None,
              fromVersion: Long = 0L): Seq[Commit] =
    commitsFrom(s, table, logState(s, table), asOf, fromVersion)

  /** [[commits]] against an already-taken [[LogState]] — the form the
    * resolution paths use so one read never mixes two log states. */
  private def commitsFrom(s: SparkSession, table: String, st: LogState,
                          asOf: Option[Long],
                          fromVersion: Long): Seq[Commit] = {
    val dir = logDir(table)
    val fs = hfs(s, dir)
    // contiguity anchor: version 1, or the truncation floor + 1 when
    // the head's predecessor is a checkpoint (see LogState.floor). A
    // fold that starts at a floor is only correct on top of that
    // checkpoint's base — so a caller that did NOT come through the
    // checkpoint path (fromVersion below the floor) must get the named
    // error, never a silently-partial fold. The floor check runs
    // BEFORE the empty-listing exit: a FULLY-truncated log (zero .txn,
    // checkpoint-only — q575's end state) must also refuse a full-log
    // fold instead of silently reporting an empty table.
    val txns = st.txns
    val floor = st.floor
    if (fromVersion < floor)
      throw new LogTruncatedException(table, fromVersion + 1, floor)
    if (txns.isEmpty) return Seq.empty
    val cap = asOf.getOrElse(Long.MaxValue)
    if (txns.head._1 > 1L && floor == 0L) return Seq.empty // listing gap
    val files = txns.filter(_._1 <= cap)
    val start = floor + 1L
    val contiguous = files.zipWithIndex
      .takeWhile { case ((v, _), i) => v == start + i }
      .map(_._1)
      .filter(_._1 > fromVersion) // bodies below the bound never open
    contiguous.map { case (v, p) =>
      val in = fs.open(p)
      val text =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
            .foreach(n => buf.write(chunk, 0, n))
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      val lines = text.split("\n").toSeq.filter(_.nonEmpty)
      val head = lines.head.split("\t")
      require(head(0) == "commit" && head(1).toLong == v,
        s"malformed commit file ${p.getName}")
      Commit(v, head(2), lines.tail.map(parseActionLine))
    }.toSeq
  }

  /** One commit-body ACTION line → [[Action]] — the single parser
    * under the batch log reader and the streaming manifest tail (the
    * streamed lines are the same bytes the batch reader opens). */
  def parseActionLine(l: String): Action = {
    val a = l.split("\t")
    val stats =
      if (a.length > 2 && a(2).nonEmpty)
        a(2).split(",").map { f =>
          val p = f.split(":"); p(0) -> (p(1).toLong, p(2).toLong)
        }.toMap
      else Map.empty[String, (Long, Long)]
    Action(a(0), a(1), stats, ref = if (a.length > 3) a(3) else "")
  }

  /** Live table state after folding `cs` in version order (stable
    * insertion order — deterministic read plans): each live segment
    * path with its ACTIVE deletion-vector sidecar, if any. A `dv`
    * action requires its base segment live and supersedes any earlier
    * dv on the same segment; a `remove` retires the segment AND its
    * dv association. */
  def liveState(cs: Seq[Commit]): Seq[(String, Option[String])] = {
    val live = new java.util.LinkedHashMap[String, Option[String]]()
    cs.foreach(_.actions.foreach { a =>
      a.kind match {
        case "add" => live.put(a.path, None)
        case "remove" => live.remove(a.path)
        case "dv" =>
          require(live.containsKey(a.ref),
            s"dv sidecar ${a.path} references non-live segment ${a.ref}")
          live.put(a.ref, Some(a.path)) // keeps insertion order
        case k => throw new IllegalArgumentException(s"unknown action $k")
      }
    })
    import scala.jdk.CollectionConverters._
    live.asScala.toSeq
  }

  /** Live segment paths after folding `cs` in version order (stable
    * insertion order — deterministic read plans). */
  def liveFiles(cs: Seq[Commit]): Seq[String] = liveState(cs).map(_._1)

  /** Distributed scan of a resolved live state: segments without a dv
    * read as ONE multi-path parquet relation (bit-identical plan to
    * the pre-dv read — the common case pays nothing); each dv'd
    * segment subtracts its sidecar with a multiset exceptAll (the
    * merge-on-READ: no segment is ever rewritten) and unions in. */
  private def readLive(s: SparkSession,
                       state: Seq[(String, Option[String])]): DataFrame = {
    if (state.forall(_._2.isEmpty)) s.read.parquet(state.map(_._1): _*)
    else {
      val plain = state.collect { case (p, None) => p }
      val parts =
        (if (plain.nonEmpty) Seq(s.read.parquet(plain: _*)) else Seq.empty) ++
          state.collect { case (p, Some(dv)) =>
            s.read.parquet(p).exceptAll(s.read.parquet(dv))
          }
      parts.reduce(_ unionAll _)
    }
  }

  /** Write-time segment zone maps: (min, max) of each stats column per
    * segment-key value, pulled to the driver — an O(segments ×
    * stats-cols) pull in the same documented class as the IVF
    * centroid-training collect: commit METADATA is driver-side by
    * construction (the writer is about to serialize it into a commit
    * file), so this is the one place a pull is the design, not a
    * shortcut. */
  def segmentStats(df: DataFrame, segCol: String,
                   cols: Seq[String]): Map[Int, Map[String, (Long, Long)]] = {
    import org.apache.spark.sql.functions.{col, max, min}
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    df.groupBy(col(segCol)).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        r.getInt(0) -> cols.zipWithIndex.map { case (c, i) =>
          c -> (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i))
        }.toMap
      }.toMap
  }

  /** Live ADD actions (with their stats) after folding `cs` — the
    * manifest view a stats-aware reader prunes from without touching
    * data files. */
  def liveActions(cs: Seq[Commit]): Seq[Action] = {
    val live = new java.util.LinkedHashMap[String, Action]()
    cs.foreach(_.actions.foreach { a =>
      a.kind match {
        case "add" => live.put(a.path, a)
        case "remove" => live.remove(a.path)
        case "dv" => // the base add (and its zone maps) stays live:
          // row deletes only SHRINK a segment's min/max range, so the
          // stats remain valid pruning bounds under merge-on-read
          require(live.containsKey(a.ref),
            s"dv sidecar ${a.path} references non-live segment ${a.ref}")
        case k => throw new IllegalArgumentException(s"unknown action $k")
      }
    })
    import scala.jdk.CollectionConverters._
    live.values.asScala.toSeq
  }

  /** Highest committed contiguous version (0 = empty table).
    * Listing-only: the version is a property of the file NAMES, so no
    * commit body is ever opened — O(1) reads however long the log.
    * Truncation-aware: the contiguous run anchors at the history
    * floor's checkpoint when commits below it were retention-deleted. */
  def currentVersion(s: SparkSession, table: String): Long =
    logState(s, table).head

  /** Snapshot-isolation read at `asOf` (None = latest): one log
    * listing, then a plain distributed parquet scan of the resolved
    * immutable segments. Returns (frame, versionRead, nLiveSegments). */
  def snapshot(s: SparkSession, table: String,
               asOf: Option[Long] = None): (DataFrame, Long, Int) = {
    // ONE listing decides floor, head, vacuum horizon AND the fold —
    // the resolution cannot mix two log states (and pays one listing,
    // not the 4-6 a per-helper re-list would cost on the path the
    // TxnProbe identified listing as the dominant residue of)
    val st = logState(s, table)
    if (st.floor > 0L) {
      // truncated log: a full-log fold no longer exists. Reads below
      // the floor get the named error; reads at/above it ride the
      // checkpoint base transparently.
      if (asOf.exists(_ < st.floor))
        throw new LogTruncatedException(table, asOf.get, st.floor)
      val (df, v, n, _) = snapshotViaCheckpointFrom(s, table, st, asOf)
      return (df, v, n)
    }
    val cs = commitsFrom(s, table, st, asOf, 0L)
    require(cs.nonEmpty, s"no commits at or before $asOf in $table")
    val v = cs.last.version
    if (v < st.vacHorizon)
      throw new VersionVacuumedException(table, v, st.vacHorizon)
    val state = liveState(cs)
    (readLive(s, state), v, state.size)
  }

  /** Write a log CHECKPOINT at `upTo`: the resolved live-segment set
    * folded into one `<v>.ckpt` file, so readers resolve
    * O(commits since checkpoint) instead of O(all commits) — how every
    * public table format keeps a year-old table's log readable.
    * Checkpoints are DERIVED data (recomputable from the commits they
    * summarize), so plain overwrite is safe: concurrent checkpointers
    * at the same version write identical bytes, and a torn checkpoint
    * is detected by its trailer line and ignored. */
  def writeCheckpoint(s: SparkSession, table: String, upTo: Long): Unit = {
    // ALWAYS fold from the newest usable checkpoint at or below
    // `upTo`, not just on truncated logs: the every-N policy otherwise
    // re-opens all N commit bodies at the Nth checkpoint — O(head)
    // per checkpoint, O(head²/every) cumulative, the exact cost
    // checkpoints exist to remove. The ckpt-fold ≡ full-fold identity
    // is the property TxnLogConcurrencySpec pins at every version.
    val floor = logFloor(s, table)
    if (upTo < floor) throw new LogTruncatedException(table, upTo, floor)
    val live = latestCheckpoint(s, table, upTo) match {
      case Some(base) =>
        val suffix = commits(s, table, Some(upTo), fromVersion = base.version)
        require(suffix.lastOption.map(_.version).getOrElse(base.version) == upTo,
          s"cannot checkpoint at $upTo: log only reaches " +
            s"${suffix.lastOption.map(_.version).getOrElse(base.version)}")
        liveState(base +: suffix)
      case None =>
        if (floor > 0L) throw new IllegalStateException(
          s"history floor $floor of $table has no readable checkpoint")
        val cs = commits(s, table, Some(upTo))
        require(cs.nonEmpty && cs.last.version == upTo,
          s"cannot checkpoint at $upTo: log only reaches ${cs.lastOption.map(_.version)}")
        liveState(cs)
    }
    val dir = logDir(table)
    val fs = hfs(s, dir)
    val out = fs.create(new Path(dir, f"$upTo%020d.ckpt"), true)
    try {
      // each live segment line, immediately followed by its active dv
      // association (fold order matters: the dv line requires its
      // segment already live in the synthetic replay)
      val lines = live.flatMap { case (p, dvo) =>
        s"live\t$p" +: dvo.map(dv => s"dv\t$p\t$dv").toSeq
      }
      val body = (s"ckpt\t$upTo" +: lines :+ "end")
        .mkString("", "\n", "\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** Greatest complete checkpoint at or below `asOf`, as a synthetic
    * base commit (version, add-actions), or None. */
  private def latestCheckpoint(s: SparkSession, table: String,
                               asOf: Long): Option[Commit] =
    latestCheckpointFrom(s, table, logState(s, table).ckpts, asOf)

  /** [[latestCheckpoint]] against candidate versions from an
    * already-taken listing (checkpoint BODIES still open fresh — they
    * are immutable once complete, so that read needs no coordination
    * with the listing). */
  private def latestCheckpointFrom(s: SparkSession, table: String,
                                   ckpts: Seq[Long],
                                   asOf: Long): Option[Commit] = {
    val fs = hfs(s, logDir(table))
    ckpts
      .filter(_ <= asOf)
      .sortBy(-_)
      .iterator
      .map(v => v -> new Path(logDir(table), f"$v%020d.ckpt"))
      .map { case (v, p) =>
        val in = fs.open(p)
        val text =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](8192)
            Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
              .foreach(n => buf.write(chunk, 0, n))
            new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
          } finally in.close()
        val lines = text.split("\n").toSeq.filter(_.nonEmpty)
        if (lines.headOption.exists(_ == s"ckpt\t$v") &&
          lines.lastOption.contains("end"))
          Some(Commit(v, "ckpt",
            lines.tail.dropRight(1).map { l =>
              val f = l.split("\t")
              f(0) match {
                case "live" => Action("add", f(1))
                case "dv" => Action("dv", f(2), ref = f(1))
                case k => throw new IllegalArgumentException(
                  s"unknown checkpoint line kind '$k' in $p")
              }
            }))
        else None // torn checkpoint: skip it, older ones still work
      }
      .collectFirst { case Some(c) => c }
  }

  /** Snapshot read that starts from the newest usable checkpoint and
    * applies only the commit suffix — same result as [[snapshot]],
    * O(suffix) log reads. Returns (frame, version, nSegments,
    * checkpointVersion: 0 = none used). */
  def snapshotViaCheckpoint(s: SparkSession, table: String,
                            asOf: Option[Long] = None)
      : (DataFrame, Long, Int, Long) =
    snapshotViaCheckpointFrom(s, table, logState(s, table), asOf)

  private def snapshotViaCheckpointFrom(s: SparkSession, table: String,
                                        st: LogState, asOf: Option[Long])
      : (DataFrame, Long, Int, Long) = {
    val cap = asOf.getOrElse(st.head)
    if (cap < st.floor) throw new LogTruncatedException(table, cap, st.floor)
    latestCheckpointFrom(s, table, st.ckpts, cap) match {
      case None =>
        // floor > 0 implies the floor checkpoint must be readable — a
        // torn anchor would otherwise loop back through snapshot()
        if (st.floor > 0L) throw new IllegalStateException(
          s"history floor ${st.floor} of $table has no readable checkpoint")
        val cs = commitsFrom(s, table, st, asOf, 0L)
        require(cs.nonEmpty, s"no commits at or before $asOf in $table")
        val v = cs.last.version
        if (v < st.vacHorizon)
          throw new VersionVacuumedException(table, v, st.vacHorizon)
        val state = liveState(cs)
        (readLive(s, state), v, state.size, 0L)
      case Some(base) =>
        // fromVersion = the checkpoint: bodies at or below it are never
        // opened — this path reads O(suffix) commit files, full stop
        val suffix = commitsFrom(s, table, st, Some(cap),
          fromVersion = base.version)
        val state = liveState(base +: suffix)
        val v = suffix.lastOption.map(_.version).getOrElse(base.version)
        if (v < st.vacHorizon)
          throw new VersionVacuumedException(table, v, st.vacHorizon)
        (readLive(s, state), v, state.size, base.version)
    }
  }

  /** Read at a version below the vacuum horizon: the clean, NAMED
    * failure mode — without it a time-travel read against vacuumed
    * segments dies deep in the scan as a parquet FileNotFound with no
    * hint that a retention policy, not corruption, removed the data. */
  class VersionVacuumedException(table: String, requested: Long, horizon: Long)
    extends RuntimeException(
      s"version $requested of $table was vacuumed: the retention horizon " +
        s"is $horizon — only versions >= $horizon remain readable")

  private def vacuumMark(table: String, horizon: Long) =
    new Path(logDir(table), f"_vacuum_$horizon%020d.mark")

  /** Current vacuum horizon (0 = never vacuumed): the max over the
    * name-encoded watermark files. The horizon lives in the file NAME,
    * never the body — creation is atomic, nothing can tear, and
    * monotonicity is a max over the listing. */
  def vacuumHorizon(s: SparkSession, table: String): Long =
    logState(s, table).vacHorizon

  /** Segments physically removable at retention `horizon`: a segment
    * is referenced by some retained version (>= horizon) iff its
    * LATEST action is an add, or a remove that landed AFTER the
    * horizon (versions horizon..removeVersion-1 still reference it).
    * So removable = latest action is a remove at version <= horizon.
    * One O(actions) pass — never the O(versions²) per-version live-set
    * fold. */
  def vacuumPlan(cs: Seq[Commit], horizon: Long): Seq[String] = {
    // (path -> (kind, version)) of each SEGMENT path's LATEST action;
    // dv sidecars tracked per base segment in landing order
    val latest = new java.util.LinkedHashMap[String, (String, Long)]()
    val dvsBySeg = new java.util.LinkedHashMap[
      String, scala.collection.mutable.ListBuffer[(String, Long)]]()
    cs.foreach(c => c.actions.foreach { a =>
      if (a.kind == "dv") {
        var buf = dvsBySeg.get(a.ref)
        if (buf == null) {
          buf = scala.collection.mutable.ListBuffer.empty[(String, Long)]
          dvsBySeg.put(a.ref, buf)
        }
        buf += ((a.path, c.version))
      } else latest.put(a.path, (a.kind, c.version))
    })
    import scala.jdk.CollectionConverters._
    val segs = latest.asScala.collect {
      case (path, ("remove", v)) if v <= horizon => path
    }.toSeq
    // a dv sidecar is referenced by some retained version (>= horizon)
    // iff it is the ACTIVE dv of a version >= horizon: dv_i is active
    // for [v_i, v_{i+1}) — removable iff superseded at <= horizon, or
    // its base segment was removed at <= horizon (then every dv of
    // that segment goes with it)
    val dvs = dvsBySeg.asScala.flatMap { case (seg, buf) =>
      val list = buf.toList
      val segGone = latest.asScala.get(seg)
        .collect { case ("remove", v) if v <= horizon => true }
        .getOrElse(false)
      if (segGone) list.map(_._1)
      else list.zip(list.tail).collect {
        case ((dvPath, _), (_, vNext)) if vNext <= horizon => dvPath
      }
    }.toSeq
    segs ++ dvs
  }

  case class VacuumResult(horizon: Long, removed: Seq[String])

  /** Execute a vacuum at `horizon`: publish the watermark FIRST (so a
    * reader below the horizon fails with the named error, never a
    * mid-scan FileNotFound from a post-publish resolution), then
    * delete the unreferenced segment files. Reads at RETAINED versions
    * are never endangered: their segments are by definition outside
    * the removable set, and a reader that resolved BEFORE the publish
    * scans immutable files the vacuum does not touch. */
  def vacuum(s: SparkSession, table: String, horizon: Long): VacuumResult = {
    // floor-aware: on a truncated log the action fold rides the FLOOR
    // checkpoint (whose synthetic adds land at the floor version) —
    // NEVER a newer one: a checkpoint folds removes away, so anchoring
    // at the newest would blind the plan to every remove in
    // (floor, newestCkpt] and silently leak those segments forever
    // (and let a later truncate delete their only remove records).
    // All commit bodies above the floor exist by the truncation rule,
    // so the floor anchor loses nothing.
    val floor = logFloor(s, table)
    val cs = if (floor == 0L) commits(s, table)
      else {
        val base = latestCheckpoint(s, table, floor).getOrElse(
          throw new IllegalStateException(
            s"history floor $floor of $table has no readable checkpoint"))
        base +: commits(s, table, fromVersion = floor)
      }
    require(cs.nonEmpty && horizon >= 1 && horizon <= cs.last.version,
      s"vacuum horizon $horizon outside committed range 1..${cs.lastOption.map(_.version).getOrElse(0L)}")
    val dir = logDir(table)
    val fs = hfs(s, dir)
    // watermark before any delete — ordering is the safety argument
    val mark = vacuumMark(table, horizon)
    if (!fs.exists(mark)) fs.create(mark, false).close()
    val removable = vacuumPlan(cs, horizon)
    removable.foreach(p => fs.delete(new Path(p), true))
    VacuumResult(horizon, removable)
  }

  /** Small-file compaction plan over the CURRENT live set: segments
    * smaller than half the largest live segment are binned (sorted by
    * path for determinism, first-fit up to `maxPerBin`) — each bin is
    * one rewrite commit (remove members, add merged). The relative
    * threshold makes the plan scale-factor-stable: "small" means small
    * against THIS table's own big segments, not an absolute byte count
    * that flips with SF. Listing-only planning (file sizes come from
    * the same FileSystem metadata a real OPTIMIZE reads); the caller
    * executes each bin and commits via [[commitWithRetry]], so a
    * concurrent writer touching a binned segment aborts the compaction
    * instead of losing data (the OCC path-conflict rule). */
  def compactionPlan(s: SparkSession, table: String,
                     maxPerBin: Int = 8): Seq[Seq[String]] = {
    require(maxPerBin >= 2, s"a compaction bin needs >= 2 members, got $maxPerBin")
    val floor = logFloor(s, table)
    val cs = if (floor == 0L) commits(s, table)
      else {
        val base = latestCheckpoint(s, table, Long.MaxValue).getOrElse(
          throw new IllegalStateException(
            s"history floor $floor of $table has no readable checkpoint"))
        base +: commits(s, table, fromVersion = base.version)
      }
    val live = liveFiles(cs)
    if (live.isEmpty) return Seq.empty
    val fs = hfs(s, new Path(table))
    val sizes = live.map { p =>
      p -> fs.getContentSummary(new Path(p)).getLength
    }
    val maxSize = sizes.map(_._2).max
    val small = sizes.filter(_._2 < maxSize / 2).map(_._1).sorted
    if (small.size < 2) Seq.empty // nothing worth merging
    else {
      // a trailing singleton folds into the previous bin (true
      // first-fit): dropping it would leave one segment that NO
      // repeated OPTIMIZE could ever compact — the plan must converge,
      // so the last bin may carry maxPerBin + 1 members instead
      val groups = small.grouped(maxPerBin).toSeq
      if (groups.length >= 2 && groups.last.size == 1)
        groups.dropRight(2) :+ (groups(groups.length - 2) ++ groups.last)
      else groups.filter(_.size >= 2)
    }
  }

  /** Execute ONE [[compactionPlan]] bin MERGE-ON-READ-aware: the
    * merged segment carries each member's VISIBLE rows — a raw member
    * read would RESURRECT every MoR-deleted row still sitting in the
    * member's dv sidecar (the compaction-after-delete hazard q588
    * pins; this is also how OPTIMIZE retires the MoR read tax: the
    * sidecar subtraction is materialized once and the sidecar becomes
    * vacuum food via the segment-removed rule). Commits
    * remove(members) + add(merged) through OCC, so a concurrent
    * writer touching a member — including a NEW dv on it, refs join
    * the conflict set — aborts the compaction instead of losing its
    * delete. */
  def compactBin(s: SparkSession, table: String, writer: String,
                 bin: Seq[String], mergedPath: String): CommitResult = {
    require(bin.nonEmpty, "empty compaction bin")
    val dvState = dvStateAt(s, table, currentVersion(s, table))
    val merged = bin.map { p =>
      val seg = s.read.parquet(p)
      dvState.get(p)
        .map(dv => seg.exceptAll(s.read.parquet(dv))).getOrElse(seg)
    }.reduce(_ unionAll _)
    merged.coalesce(1).write.parquet(mergedPath)
    commitWithRetry(s, table, writer,
      bin.map(Action("remove", _)) :+ Action("add", mergedPath))
  }

  case class TruncateResult(floor: Long, deletedCommits: Int)

  /** Log RETENTION: physically delete the commit bodies a checkpoint
    * has already folded — the third lifecycle deleter beside segment
    * [[vacuum]] (old DATA) and checkpointing (derived summaries). The
    * O(N) residue the TxnProbe measured in checkpoint resolution is
    * the directory LISTING of old .txn files; this removes it, keeping
    * a decade-old table's log directory O(suffix since last
    * checkpoint) however many commits it ever saw.
    *
    * Anchors at the NEWEST COMPLETE checkpoint (validated by parsing
    * it — a torn checkpoint must never become the only history
    * anchor), deletes every .txn at or below it, and relies on the
    * [[logFloorOf]] rule so readers distinguish a truncated log
    * (first txn's predecessor is a checkpoint → anchor there) from a
    * listing gap (no checkpoint → see an empty log). Reads below the
    * floor fail with [[LogTruncatedException]]; reads at or above it
    * are unaffected (snapshot() transparently rides the checkpoint).
    * Time travel below the floor is the price of retention — exactly
    * the trade public table formats document for log cleanup. */
  def truncateLog(s: SparkSession, table: String): TruncateResult = {
    val anchor = latestCheckpoint(s, table, Long.MaxValue).getOrElse(
      throw new IllegalStateException(
        s"cannot truncate $table: no complete checkpoint to anchor the floor"))
    val dir = logDir(table)
    val fs = hfs(s, dir)
    // log retention >= data retention (the public formats' rule, and
    // why): the remove actions below the anchor are the ONLY record
    // that their segments are deletable — truncating before vacuuming
    // them would orphan those files forever (no API could ever find
    // them again), and a later "hard purge" would silently fail its
    // physical-deletion guarantee. Refuse unless every pre-anchor
    // removable segment is already off the disk.
    // the orphan-guard fold anchors at the FLOOR checkpoint, not the
    // (possibly newer) truncation anchor: removes in (floor, anchor]
    // are folded AWAY by the anchor checkpoint, and missing them here
    // would pass the guard with unvacuumed removed segments below the
    // new floor — then delete their only remove records, permanently
    // orphaning the files and silently breaking the hard-purge (q580)
    // guarantee
    val floor = logFloor(s, table)
    val cs = if (floor == 0L) commits(s, table)
      else {
        val base = latestCheckpoint(s, table, floor).getOrElse(
          throw new IllegalStateException(
            s"history floor $floor of $table has no readable checkpoint"))
        base +: commits(s, table, fromVersion = floor)
      }
    val pending = vacuumPlan(cs, anchor.version)
      .filter(p => fs.exists(new Path(p)))
    require(pending.isEmpty,
      s"cannot truncate $table: ${pending.size} removed segments below " +
        s"the anchor are not yet vacuumed (vacuum(horizon = " +
        s"${anchor.version}) first): ${pending.take(3).mkString(", ")}")
    val doomed = logState(s, table).txns.filter(_._1 <= anchor.version)
    // delete NEWEST-first: a reader listing mid-truncation then sees a
    // contiguous prefix 1..k (a valid HISTORICAL snapshot — the same
    // graceful degradation an eventually-consistent listing gives),
    // never a headless fragment it would misread as an empty log
    doomed.sortBy(-_._1).foreach { case (_, p) => fs.delete(p, false) }
    TruncateResult(anchor.version, doomed.size)
  }

  /** Checkpoint-every-N policy: write a checkpoint when the head has
    * advanced `every` commits past the newest existing checkpoint.
    * Returns the version checkpointed, or None if not due. Keeps
    * snapshot resolution O(every) log reads regardless of table age —
    * call it after commits (it is idempotent and safe under races:
    * checkpoints are derived data, concurrent writers at the same
    * version write identical bytes). */
  def checkpointIfDue(s: SparkSession, table: String,
                      every: Int): Option[Long] = {
    require(every >= 1, s"checkpoint interval must be >= 1, got $every")
    val head = currentVersion(s, table)
    if (head == 0L) return None
    val dir = logDir(table)
    val fs = hfs(s, dir)
    val newest = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.ckpt"))
      .map(_.stripSuffix(".ckpt").toLong)
      .foldLeft(0L)(math.max)
    if (head - newest >= every) { writeCheckpoint(s, table, head); Some(head) }
    else None
  }

  /** Change-data-feed between versions (`fromV`, `toV`]: row-level
    * changes derived from the commit ACTIONS alone — the suffix
    * commits name exactly which segments changed, so the feed opens
    * ONLY those files and never resolves a full snapshot (what a CDC
    * consumer tails at 100 TB: cost is O(changed data), not O(table)).
    * Per-commit classification:
    *   - add-only commit: every row of the added segments is an insert
    *   - remove-only commit: every row of the removed segments is a
    *     delete
    *   - add+remove (rewrite: compaction, copy-on-write
    *     delete/update/merge): the NET row diff — exceptAll in both
    *     directions strips every byte-identical row (a pure compaction
    *     nets to zero changes, the reader-visible proof compaction is
    *     invisible — the q570 contract), then each surviving row is
    *     classified by whether its IDENTITY persists on the other
    *     side: same `idCols` present → an update (`update_pre` the old
    *     row, `update_post` the new one, the Delta CDF convention);
    *     absent → a plain insert/delete
    * Requires every column exceptAll-comparable (exact types — the
    * segment schemas here are BIGINT/VARCHAR; float payloads would
    * need an epsilon diff instead).
    * Returns (changes with _change_type ∈
    * insert|delete|update_pre|update_post and _commit_version columns,
    * segments opened). */
  def changeFeed(s: SparkSession, table: String, fromV: Long, toV: Long,
                 idCols: Seq[String]): (DataFrame, Int) = {
    import org.apache.spark.sql.functions.lit
    require(fromV < toV, s"empty CDF range ($fromV, $toV]")
    // fromVersion = fromV: bodies at or below the range start are never
    // opened, and a range reaching below a truncated log's floor gets
    // the named error instead of a silently-partial feed
    val st = logState(s, table)
    val suffix = commitsFrom(s, table, st, Some(toV), fromVersion = fromV)
    require(suffix.nonEmpty && suffix.last.version == toV,
      s"log does not reach $toV past $fromV in $table")
    // merge-on-read awareness: removes and dv deltas need the ACTIVE
    // dv per segment AT fromV — resolved from the log (checkpoint +
    // suffix, O(commits) driver-side metadata, never data) and ONLY
    // when the range contains a remove or dv action; a pure-append
    // tail (the streaming-ingest common case) pays zero extra reads
    var dvState: Map[String, String] =
      if (!suffix.exists(_.actions.exists(a =>
          a.kind == "remove" || a.kind == "dv"))) Map.empty
      else dvStateAtFrom(s, table, st, fromV)
    var opened = 0
    val perCommit = suffix.map { c =>
      val (dfs, nd, op) = commitChanges(s, c, dvState, idCols)
      dvState = nd
      opened += op
      dfs
    }
    val nonEmpty = perCommit.flatten
    require(nonEmpty.nonEmpty, s"no data actions in ($fromV, $toV] of $table")
    (nonEmpty.reduce(_ unionAll _), opened)
  }

  /** Active dv sidecar per live segment at version `asOf` — O(log)
    * driver-side metadata reads (checkpoint + suffix), never data. */
  def dvStateAt(s: SparkSession, table: String,
                asOf: Long): Map[String, String] =
    dvStateAtFrom(s, table, logState(s, table), asOf)

  private def dvStateAtFrom(s: SparkSession, table: String, st: LogState,
                            asOf: Long): Map[String, String] = {
    if (asOf == 0L) return Map.empty
    val baseCs =
      if (st.floor == 0L) commitsFrom(s, table, st, Some(asOf), 0L)
      else latestCheckpointFrom(s, table, st.ckpts, asOf) match {
        case Some(b) =>
          b +: commitsFrom(s, table, st, Some(asOf), b.version)
        case None => throw new IllegalStateException(
          s"history floor ${st.floor} of $table has no readable checkpoint")
      }
    liveState(baseCs).collect { case (p, Some(dv)) => p -> dv }.toMap
  }

  /** Row-level changes of ONE commit, given the active dv state at
    * its predecessor — the shared classification under batch
    * [[changeFeed]] and the streaming CDF tail
    * (streaming/Sessions.streamChangeFeedToBatch), so stream ≡ batch
    * is structural, not coincidental. Returns (change frames, dv
    * state after the commit, data files opened). */
  def commitChanges(s: SparkSession, c: Commit,
                    dvState0: Map[String, String], idCols: Seq[String])
      : (Seq[DataFrame], Map[String, String], Int) = {
    import org.apache.spark.sql.functions.lit
    var dvState = dvState0
    val adds = c.actions.filter(_.kind == "add").map(_.path)
    val removes = c.actions.filter(_.kind == "remove").map(_.path)
    val dvActs = c.actions.filter(_.kind == "dv")
    var opened = adds.size + removes.size
    def tag(df: DataFrame, t: String) = df
      .withColumn("_change_type", lit(t))
      .withColumn("_commit_version", lit(c.version))
    // a removed segment's rows MINUS its active dv: rows the dv had
    // already deleted must not surface as deletes twice
    def readRemoved(): DataFrame = {
      if (removes.forall(p => !dvState.contains(p)))
        s.read.parquet(removes: _*) // pre-dv plan, bit-identical
      else removes.map { p =>
        val seg = s.read.parquet(p)
        dvState.get(p) match {
          case Some(dv) => opened += 1; seg.exceptAll(s.read.parquet(dv))
          case None => seg
        }
      }.reduce(_ unionAll _)
    }
    val addRemove = (adds.nonEmpty, removes.nonEmpty) match {
      case (true, false) => Seq(tag(s.read.parquet(adds: _*), "insert"))
      case (false, true) => Seq(tag(readRemoved(), "delete"))
      case (true, true) =>
        import org.apache.spark.sql.functions.{col, when}
        val a = s.read.parquet(adds: _*)
        val r = readRemoved()
        // classify each surviving diff row by identity persistence:
        // ONE left join against the other side's distinct ids (never
        // two passes over the diff)
        def classify(diff: DataFrame, other: DataFrame,
                     persists: String, alone: String): DataFrame = {
          val ids = other.select(idCols.map(col): _*).distinct()
            .withColumn("__m", lit(1))
          diff.join(ids, idCols, "left")
            .withColumn("_change_type",
              when(col("__m").isNull, lit(alone)).otherwise(lit(persists)))
            .withColumn("_commit_version", lit(c.version))
            .select(diff.columns.map(col) :+ col("_change_type") :+
              col("_commit_version"): _*)
        }
        Seq(classify(a.exceptAll(r), r, "update_post", "insert")
          .unionAll(classify(r.exceptAll(a), a, "update_pre", "delete")))
      case (false, false) => Seq.empty
    }
    // dv actions: the commit's row-level deletes are the DELTA —
    // new sidecar minus the superseded one (each dv is cumulative)
    val dvDeletes = dvActs.map { a =>
      val newRows = s.read.parquet(a.path)
      opened += 1
      val delta = dvState.get(a.ref) match {
        case Some(prev) =>
          opened += 1; newRows.exceptAll(s.read.parquet(prev))
        case None => newRows
      }
      dvState += (a.ref -> a.path)
      tag(delta, "delete")
    }
    dvState --= removes // retired segments drop their association
    (addRemove ++ dvDeletes, dvState, opened)
  }

  /** Optimistic-concurrency commit loop: try the current head + 1; on
    * losing the race, re-read the intervening commits and rebase iff
    * this writer's touched-path set is disjoint from every winner's
    * (append vs append and append vs compact commute; two operations
    * touching the same segment do not — the standard file-level OCC
    * conflict rule). Aborts with IllegalStateException on a true
    * conflict or after `maxAttempts`. */
  def commitWithRetry(s: SparkSession, table: String, writer: String,
                      actions: Seq[Action],
                      maxAttempts: Int = 10,
                      baseVersion: Option[Long] = None): CommitResult = {
    // a dv action touches its BASE segment too: a merge-on-read delete
    // must conflict with a compaction or CoW rewrite of that segment
    // (file-level OCC — they do not commute), so refs join the set
    def touched(as: Seq[Action]): Set[String] =
      as.flatMap(a => a.path +: (if (a.ref.nonEmpty) Seq(a.ref)
                                 else Seq.empty)).toSet
    val mine = touched(actions)
    var attempt = 0
    // `baseVersion` pins the snapshot the writer PREPARED against
    // (possibly stale — the contention path); default reads the head
    var base = baseVersion.getOrElse(currentVersion(s, table))
    while (attempt < maxAttempts) {
      attempt += 1
      val v = base + 1
      if (tryCommit(s, table, v, writer, actions))
        return CommitResult(v, attempt)
      // lost: somebody owns v (and possibly more). Conflict-check
      // every commit that landed since our base before rebasing —
      // fromVersion = base: older bodies are irrelevant AND never open
      val landed = commits(s, table, fromVersion = base)
      val clash = landed.flatMap(c => touched(c.actions)).toSet.intersect(mine)
      if (clash.nonEmpty)
        throw new CommitConflictException(
          s"writer $writer conflicts on segments $clash at version ${base + 1}",
          attempt)
      base = landed.lastOption.map(_.version).getOrElse(base)
      // full-jitter exponential backoff before the re-publish (the
      // public AWS backoff design): N racing writers otherwise stay
      // SYNCHRONIZED — every loser re-reads and re-publishes against
      // the same next version at the same instant, burning one wasted
      // log read + publish per competitor per round (measured 4.4
      // attempts/commit at 8 disjoint writers; SCALING.md carries the
      // before/after). Uncontended commits never sleep (attempt 1
      // returns above); the jitter draw is over [0, ceiling] so a
      // lucky retrier still goes immediately.
      val ceiling = math.min(100L, 1L << math.min(attempt + 1, 7))
      Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(ceiling + 1))
    }
    throw new CommitConflictException(
      s"writer $writer gave up after $maxAttempts attempts", maxAttempts)
  }

  /** MERGE-ON-READ delete: remove every row matching `cond` WITHOUT
    * rewriting a single segment — for each live segment whose
    * still-visible rows match, write a NEW cumulative dv sidecar
    * (previous sidecar rows + the new matches) and commit one `dv`
    * action per touched segment. Untouched segments get no action at
    * all (per-segment targeting — at 100 TB a point delete touches
    * one segment's sidecar, not the table). The write cost is
    * O(deleted rows), not O(segment): the trade against copy-on-write
    * ([[changeFeed]]'s rewrite path) is deferred to readers, which
    * subtract the sidecar per scan until OPTIMIZE rewrites — the
    * public deletion-vector design. The per-segment probe loop is a
    * driver-side loop over O(live segments) with one bounded job
    * each, the same documented class as [[compactionPlan]] execution.
    *
    * Returns the commit result, or None when nothing matched (a no-op
    * delete publishes no commit). */
  def deleteWhereMoR(s: SparkSession, table: String, writer: String,
                     cond: org.apache.spark.sql.Column)
      : Option[CommitResult] = {
    val st = logState(s, table)
    val (cs, head) =
      if (st.floor == 0L) {
        val c = commitsFrom(s, table, st, None, 0L)
        require(c.nonEmpty, s"cannot delete from empty table $table")
        (c, c.last.version)
      } else {
        val base = latestCheckpointFrom(s, table, st.ckpts, st.floor)
          .getOrElse(throw new IllegalStateException(
            s"history floor ${st.floor} of $table has no readable checkpoint"))
        val suf = commitsFrom(s, table, st, None, st.floor)
        (base +: suf, suf.lastOption.map(_.version).getOrElse(st.floor))
      }
    val actions = liveState(cs).flatMap { case (seg, dvo) =>
      val segDf = s.read.parquet(seg)
      val visible = dvo
        .map(dv => segDf.exceptAll(s.read.parquet(dv)))
        .getOrElse(segDf)
      val hits = visible.filter(cond)
      if (hits.isEmpty) None
      else {
        val newDv = dvo
          .map(dv => s.read.parquet(dv).unionAll(hits)).getOrElse(hits)
        val dvPath = s"$table/_dv/${new Path(seg).getName}" +
          s"_dv${stagingSeq.incrementAndGet()}"
        newDv.coalesce(1).write.parquet(dvPath)
        Some(Action("dv", dvPath, ref = seg))
      }
    }
    if (actions.isEmpty) None
    else Some(commitWithRetry(s, table, writer, actions,
      baseVersion = Some(head)))
  }
}
