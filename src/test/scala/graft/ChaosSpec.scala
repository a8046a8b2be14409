package graft

import graft.ingest.Connectors
import graft.ingest.Connectors.{RawSegment, StubAsrEngine, StubTranscriptFetcher, TranscriptFetcher}
import graft.model.Schema
import org.apache.spark.TaskContext

/** Chaos coverage (r6 verdict stretch): the reference's error-path
  * semantics under the engine's retry machinery, end to end — a task
  * killed MID-PARTITION inside `ingestWithFallback` must be retried by
  * Spark (the shared session runs `local[4, 2]`) and leave the output
  * bit-identical to a clean run, and re-delivered output through the
  * id-skip JSONL sink (the O1 `overwrites: False` semantics, the q119
  * sink discipline) must stay exactly-once.
  */
object Chaos {
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
  val sawRetry = new java.util.concurrent.atomic.AtomicBoolean(false)
  val thinFired = new java.util.concurrent.atomic.AtomicBoolean(false)
  // defined HERE, not on the suite: a suite-method closure would drag
  // the non-serializable ScalaTest engine into the task closure
  def audioFor(id: String): Array[Byte] =
    Array.fill(64000)((id.length % 127).toByte)
}

/** Throws ONCE, the first time any task reaches the target id — a
  * mid-partition death after earlier rows of that partition were
  * already produced; subsequent attempts pass through to the stub. */
class ChaosFetcher extends TranscriptFetcher {
  private val stub = new StubTranscriptFetcher
  override def fetch(videoId: String): Either[String, Seq[RawSegment]] = {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() > 0) Chaos.sawRetry.set(true)
    if (videoId == "vid_7" && !Chaos.fired.getAndSet(true))
      throw new RuntimeException("chaos: injected task death mid-partition")
    stub.fetch(videoId)
  }
}

class ChaosSpec extends SparkSpec {
  import spark.implicits._

  // mixed ok/fallback population: bad_* routes through the ASR branch
  private def ids = spark.createDataset(
    (0 until 16).map(i => if (i % 5 == 0) s"bad_$i" else s"vid_$i"))
  private def run(fetcher: () => TranscriptFetcher) =
    Connectors.ingestWithFallback(spark, ids, fetcher,
        () => new StubAsrEngine, Chaos.audioFor)
      .collect().sortBy(_.id).toSeq

  test("a task killed mid-partition is retried and the fallback DAG output matches a clean run") {
    val clean = run(() => new StubTranscriptFetcher)
    Chaos.fired.set(false); Chaos.sawRetry.set(false)
    val chaotic = run(() => new ChaosFetcher)
    assert(Chaos.fired.get, "the chaos kill never fired")
    assert(Chaos.sawRetry.get,
      "Spark never re-attempted the killed task (is the master local[n, 2]?)")
    // exactly-once THROUGH the engine: the replayed task's rows appear
    // once, nothing lost, both branches (transcript + ASR fallback)
    // intact — bit-identical to the run with no failure
    assert(chaotic == clean && clean.size == 16)
  }

  test("re-delivered output through the id-skip JSONL sink stays exactly-once") {
    val out = run(() => new StubTranscriptFetcher).toDS().toDF()
    val dir = java.nio.file.Files.createTempDirectory("chaos-jsonl").toString
    // the O1 sink: append only ids not already in the target (the
    // foreachBatchDedupSink discipline, JSONL batch form)
    def deliver(batch: org.apache.spark.sql.DataFrame): Unit = {
      val path = new org.apache.hadoop.fs.Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val unique = batch.dropDuplicates("id")
      val fresh =
        if (fs.listStatus(path).exists(_.getPath.getName.endsWith(".json"))) {
          val existing = spark.read.schema(Schema.ingest).json(dir).select("id")
          unique.join(existing, Seq("id"), "left_anti")
        } else unique
      fresh.write.mode("append").json(dir)
    }
    deliver(out.limit(7)) // partial first delivery (died mid-stream)
    deliver(out)          // full replay
    deliver(out)          // and a second full replay
    val back = spark.read.schema(Schema.ingest).json(dir)
    assert(back.count() == 16L)
    assert(back.groupBy("id").count().where($"count" > 1).count() == 0L)
  }

  test("a task killed inside the GreedyThinExec stage recomputes to identical output") {
    // the kill fires in a projection AFTER the custom exec — the same
    // post-shuffle stage — so Spark must re-run the thinning task from
    // shuffle blocks; the O(1)-state pass must be deterministic under
    // recomputation (it is: pure function of the sorted partition)
    import org.apache.spark.sql.functions.{col, udf}
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .where(col("ts").isNotNull)
    def thin() = graft.plans.GreedyThinOp.thin(
      ev, Seq("user_id"), "ts", Seq("event_id"), 3600L * 1000000L)
    val clean = thin().select("event_id").collect().map(_.getLong(0)).toSet
    Chaos.thinFired.set(false)
    val killer = udf { (id: Long) =>
      if (!Chaos.thinFired.getAndSet(true))
        throw new RuntimeException("chaos: killed inside the thin stage")
      id
    }
    val chaotic = thin().select(killer(col("event_id")).as("event_id"))
      .collect().map(_.getLong(0)).toSet
    assert(Chaos.thinFired.get, "the chaos kill never fired")
    assert(chaotic == clean && clean.nonEmpty)
  }
}
