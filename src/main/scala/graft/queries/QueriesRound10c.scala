package graft.queries

import graft.Tables._
import graft.ops.{Sampling, TxnLog}
import graft.ops.TxnLog.Action
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 third batch: the rest of the table-protocol story — log
  * checkpointing (q550), point-lookup index pruning with per-segment
  * Blooms (q551), a streaming writer driving the commit log with
  * replay idempotence (q552) — plus Cliff's delta, the ordinal effect
  * size the A/B family was missing (q553).
  */
object QueriesRound10c {

  private def reset(s: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def base(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderkey"),
      col("o_orderstatus").as("status"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))

  val defs: Seq[QueryDef] = Seq(

    // ---- q550: log checkpointing ---------------------------------------------------
    // A year-old 100 TB table has ~10⁵ commits; resolving them all per
    // read is the log's own scalability bug. The checkpoint folds the
    // live set at version v into one file; readers start there and
    // apply only the suffix — O(commits since checkpoint). This lane
    // builds the q538 history, checkpoints at v3 (post-compaction),
    // lets v4 land after, and reads through the checkpoint: the hash
    // gate proves ckpt+suffix ≡ full-log resolution (the fold is
    // associative), and `ckpt_equals_full` carries the file-set
    // comparison computed against the full resolution in-query.
    QueryDef("q550_txn_checkpoint",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q550"
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
        val c = s"$root/seg_c"
        s.read.parquet(a, b).coalesce(1).write.parquet(c)
        require(TxnLog.tryCommit(s, root, 3L, "compactor",
          Seq(Action("remove", a), Action("remove", b), Action("add", c))))
        TxnLog.writeCheckpoint(s, root, 3L) // fold v1-v3 into one file
        val dd = seg("seg_d", 2)
        require(TxnLog.tryCommit(s, root, 4L, "ingest", Seq(Action("add", dd))))
        val (snap, ver, nSegs, ckptV) = TxnLog.snapshotViaCheckpoint(s, root)
        // the associativity proof: ckpt+suffix file set == full-log set
        val full = TxnLog.liveFiles(TxnLog.commits(s, root))
        val viaCkpt = TxnLog.liveFiles(
          TxnLog.commits(s, root).filter(_.version > 3L)
            .prepended(TxnLog.Commit(3L, "ckpt",
              Seq(Action("add", c)))))
        snap.groupBy("status").agg(
          count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .withColumn("version", lit(ver))
          .withColumn("n_segments", lit(nSegs))
          .withColumn("ckpt_version", lit(ckptV))
          .withColumn("ckpt_equals_full", lit(full.toSet == viaCkpt.toSet))
          .orderBy("status")
      },
      Some("""SELECT o_orderstatus AS status,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(4 AS BIGINT) AS version, CAST(2 AS INTEGER) AS n_segments,
        |  CAST(3 AS BIGINT) AS ckpt_version, true AS ckpt_equals_full
        |FROM orders WHERE o_orderkey % 4 IN (0, 1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q551: point-lookup index pruning (per-segment Blooms) --------------------
    // q541's zone maps prune RANGE predicates on the clustered column;
    // a point lookup on a NON-clustered key (find order X in a
    // date-clustered table) gets nothing from min/max — every
    // segment's key range spans the probe. The per-segment Bloom
    // filter (m = 16384 bits, k = 7 md5-derived positions — the q535
    // sizing) prunes it probabilistically: a segment is touched only
    // if ALL 7 of the probe's bit positions are present. The lane
    // measures, for ~n/5000 deterministic probe keys: segments touched
    // under min/max (≈ all of them), under the Bloom (≈ 1 + measured
    // false positives), and the exact truth (1) — plus the
    // FALSE-NEGATIVE count, which the hash gate pins to ZERO (the
    // correctness half of the Bloom contract; q292's law, now at the
    // segment-index granularity). Everything is md5-integer
    // arithmetic, so the oracle rebuilds the identical index.
    QueryDef("q551_point_lookup_index",
      (s, d) => {
        val o = orders(s, d).select(col("o_orderkey").as("okey"),
          expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("seg"))
        def positions(key: org.apache.spark.sql.Column) = array(
          (0 until 7).map(i => struct(lit(i).as("i"),
            (Sampling.hashLong(concat_ws("#", key, lit(i))) % 16384)
              .as("pos"))): _*)
        val segBits = o.select(col("seg"),
          explode(positions(col("okey"))).as("bp"))
          .select(col("seg"), col("bp.i").as("i"), col("bp.pos").as("pos"))
          .distinct()
        val probes = o.where(col("okey") % 4999 === 1)
          .select(col("okey").as("pk"), col("seg").as("true_seg"))
        val probeBits = probes.select(col("pk"), col("true_seg"),
          explode(positions(col("pk"))).as("bp"))
          .select(col("pk"), col("true_seg"), col("bp.i").as("i"),
            col("bp.pos").as("pos"))
        // bloom-touched: all 7 positions present in the segment
        val touched = probeBits.join(segBits, Seq("i", "pos"))
          .groupBy("pk", "true_seg", "seg")
          .agg(countDistinct("i").as("hits"))
          .where(col("hits") === 7)
        val bloomStats = touched.groupBy("pk", "true_seg")
          .agg(count(lit(1)).as("bloom_touched"),
            sum((col("seg") === col("true_seg")).cast("long"))
              .as("true_hit"))
        // min/max-touched: probe key inside the segment's key range
        val ranges = o.groupBy("seg")
          .agg(min("okey").as("mn"), max("okey").as("mx"))
        val mmStats = probes.join(broadcast(ranges),
            col("pk") >= col("mn") && col("pk") <= col("mx"))
          .groupBy("pk").agg(count(lit(1)).as("mm_touched"))
        bloomStats.join(mmStats, Seq("pk"))
          .agg(count(lit(1)).as("n_probes"),
            sum("mm_touched").as("minmax_touched"),
            sum("bloom_touched").as("bloom_touched"),
            sum(expr("bloom_touched - true_hit")).as("bloom_fp_touches"),
            sum(expr("1 - true_hit")).as("bloom_false_negatives"))
      },
      Some {
        val h = DuckSql.hashLong(
          "CAST(okey AS VARCHAR) || '#' || CAST(i AS VARCHAR)")
        val hp = DuckSql.hashLong(
          "CAST(pk AS VARCHAR) || '#' || CAST(i AS VARCHAR)")
        s"""WITH o AS (SELECT o_orderkey AS okey,
        |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS seg
        |  FROM orders),
        |iv AS (SELECT i FROM (VALUES (0),(1),(2),(3),(4),(5),(6)) t(i)),
        |segbits AS (SELECT DISTINCT seg, i, $h % 16384 AS pos
        |  FROM o CROSS JOIN iv),
        |probes AS (SELECT okey AS pk, seg AS true_seg FROM o
        |  WHERE okey % 4999 = 1),
        |probebits AS (SELECT pk, true_seg, i, $hp % 16384 AS pos
        |  FROM probes CROSS JOIN iv),
        |touched AS (SELECT pk, true_seg, s.seg,
        |    count(DISTINCT p.i) AS hits
        |  FROM probebits p JOIN segbits s ON p.i = s.i AND p.pos = s.pos
        |  GROUP BY 1, 2, 3 HAVING count(DISTINCT p.i) = 7),
        |bs AS (SELECT pk, true_seg,
        |    CAST(count(*) AS BIGINT) AS bloom_touched,
        |    CAST(sum(CASE WHEN seg = true_seg THEN 1 ELSE 0 END) AS BIGINT)
        |      AS true_hit
        |  FROM touched GROUP BY 1, 2),
        |rng AS (SELECT seg, min(okey) AS mn, max(okey) AS mx
        |  FROM o GROUP BY 1),
        |mm AS (SELECT pk, CAST(count(*) AS BIGINT) AS mm_touched
        |  FROM probes JOIN rng ON pk >= mn AND pk <= mx GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(sum(mm_touched) AS BIGINT) AS minmax_touched,
        |  CAST(sum(bloom_touched) AS BIGINT) AS bloom_touched,
        |  CAST(sum(bloom_touched - true_hit) AS BIGINT) AS bloom_fp_touches,
        |  CAST(sum(1 - true_hit) AS BIGINT) AS bloom_false_negatives
        |FROM bs JOIN mm USING (pk)""".stripMargin
      }),

    // ---- q552: STREAMING writer on the commit log (lane #33) ----------------------
    // The write side of exactly-once: a streaming job lands each
    // micro-batch as an immutable segment + one commit (version =
    // batchId + 1), so a REPLAYED batch (restart re-delivery) loses
    // the version race instead of double-appending — the commit log IS
    // the idempotence ledger (the reference's `overwrites: False`
    // semantics at table granularity; the q119 sink discipline
    // promoted to the table format). Four file-per-trigger
    // micro-batches over quarter-split events; after the run the lane
    // REPLAYS batch 0's commit verbatim and pins that it was blocked.
    // The snapshot must carry every event exactly once.
    QueryDef("q552_streaming_commit_log",
      (s, d) => {
        val root = Scratch.dir(s, d) + "/txn_q552"
        reset(s, root)
        // quarter-split the stream input into 4 files (ordered names →
        // deterministic micro-batch contents under maxFilesPerTrigger=1)
        val ev = events(s, d).select(col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT) % 4")
            .as("q"))
        (0 until 4).foreach { i =>
          ev.where(col("q") === i).drop("q")
            .coalesce(1).write.parquet(s"$root/in/in_$i")
        }
        val sch = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cents",
            org.apache.spark.sql.types.LongType)))
        val stream = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "*.parquet")
          .option("recursiveFileLookup", "true")
          .parquet(s"$root/in") // input isolated from the segments we write
        var firstCommit: Option[(Long, Seq[Action])] = None
        val q = stream.writeStream
          .option("checkpointLocation", s"$root/_ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val seg = s"$root/seg_$id"
            batch.coalesce(1).write.mode("overwrite").parquet(seg)
            val actions = Seq(Action("add", seg))
            require(TxnLog.tryCommit(s, root, id + 1, s"writer_$id", actions))
            if (id == 0) firstCommit = Some((1L, actions))
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally q.stop()
        // replay batch 0's commit verbatim: the version race must block it
        val replayBlocked = firstCommit.exists { case (v, acts) =>
          !TxnLog.tryCommit(s, root, v, "writer_0_replay", acts)
        }
        val (snap, ver, nSegs) = TxnLog.snapshot(s, root)
        snap.agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
          .select(col("n_rows"), col("sum_cents"),
            lit(ver).as("final_version"), lit(nSegs).as("n_segments"),
            lit(replayBlocked).as("replay_blocked"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(4 AS BIGINT) AS final_version,
        |  CAST(4 AS INTEGER) AS n_segments,
        |  true AS replay_blocked
        |FROM events""".stripMargin)),

    // ---- q553: Cliff's delta (ordinal effect size) ---------------------------------
    // The effect-SIZE readout beside the family's significance tests
    // (A/A floor q466, KS q455, MH q524): delta = P(x>y) − P(x<y) over
    // the exposed/control doc-length samples, computed EXACTLY from
    // the two value-frequency tables — the cross join is value-domain
    // × value-domain (distinct n_chars counts), never doc × doc. The
    // numerator is signed, so the q522 signum discipline applies.
    QueryDef("q553_cliffs_delta",
      (s, d) => {
        val docs = documents(s, d).select(col("n_chars").as("v"),
          (expr("CAST(substring(source, 4, 10) AS INT) % 2") === 0)
            .as("exposed"))
        val fx = docs.where(col("exposed")).groupBy("v")
          .agg(count(lit(1)).as("fx"))
        val fy = docs.where(!col("exposed")).groupBy("v")
          .agg(count(lit(1)).as("fy"))
          .withColumnRenamed("v", "w")
        fx.crossJoin(fy)
          .agg(sum(expr("fx * fy * CAST(sign(v - w) AS BIGINT)")).as("num"),
            sum(expr("fx * fy")).as("den"))
          .select(col("num"), col("den"),
            expr("CAST(signum(num) AS BIGINT) * (abs(num) * 1000000 div den)")
              .as("delta_ppm"))
      },
      Some("""WITH docs AS (SELECT n_chars AS v,
        |    CAST(substring(source, 4, 10) AS INTEGER) % 2 = 0 AS exposed
        |  FROM documents),
        |fx AS (SELECT v, CAST(count(*) AS BIGINT) AS fx FROM docs
        |  WHERE exposed GROUP BY 1),
        |fy AS (SELECT v AS w, CAST(count(*) AS BIGINT) AS fy FROM docs
        |  WHERE NOT exposed GROUP BY 1)
        |SELECT CAST(sum(fx * fy * CAST(sign(v - w) AS BIGINT)) AS BIGINT)
        |    AS num,
        |  CAST(sum(fx * fy) AS BIGINT) AS den,
        |  CAST(sign(CAST(sum(fx * fy * CAST(sign(v - w) AS BIGINT))
        |      AS BIGINT)) AS BIGINT)
        |    * (abs(CAST(sum(fx * fy * CAST(sign(v - w) AS BIGINT))
        |      AS BIGINT)) * 1000000
        |      // CAST(sum(fx * fy) AS BIGINT)) AS delta_ppm
        |FROM fx CROSS JOIN fy""".stripMargin))
  )
}
