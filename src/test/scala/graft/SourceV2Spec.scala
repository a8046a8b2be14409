package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 connector: planning surface (partitions, pruning) and
  * end-to-end integration with the normalization pipeline. */
class SourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def read(ids: Seq[String], parts: Int = 2) =
    spark.read.format("graft-stub-transcripts")
      .option("ids", ids.mkString(","))
      .option("numPartitions", parts.toString)
      .load()

  test("short-name registration + schema + deterministic rows") {
    val df = read(Seq("vidA", "vidB"))
    assert(df.schema == graft.model.Schema.rawTranscript)
    val rows = df.as[(String, Double, Double, String)].collect().sortBy(r => (r._1, r._2))
    assert(rows.length == 4)
    assert(rows.head == ("vidA", 0.0, 1.5, "hello from vidA."))
  }

  test("ids split across the requested number of input partitions") {
    val df = read(Seq("a", "b", "c", "d", "e"), parts = 3)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 10)
  }

  test("column pruning reaches the reader (plan shows pruned ReadSchema)") {
    val df = read(Seq("vidA")).select("video_id")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output columns inline
    assert(plan.contains("BatchScan graft_stub_transcripts[video_id#"), plan)
    assert(!plan.contains("text#"), plan)
    assert(df.as[String].collect().toSet == Set("vidA"))
  }

  test("source feeds the T5/T6 normalization pipeline end to end") {
    val recs = graft.ingest.Normalize.segmentsFromRaw(read(Seq("vidZ")))
      .select(col("video_id"),
        graft.ingest.Normalize.flattenSegments(col("segments")).as("text"))
      .as[(String, String)].head()
    assert(recs == ("vidZ", "hello from vidZ.\nsecond segment of vidZ!"))
  }

  // ---- graft-audio-capture: the S5 MicroBatchStream source ----

  private def captureOpts(r: org.apache.spark.sql.DataFrameReader) = r
    .format("graft-audio-capture")
    .option("devices", "3").option("totalChunks", "40")
    .option("chunksPerBatch", "7")

  test("audio capture: stream equals the batch twin of the SAME table, exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cap").toString
    val q = spark.readStream.format("graft-audio-capture")
      .option("devices", "3").option("totalChunks", "40")
      .option("chunksPerBatch", "7")
      .load()
      .writeStream.format("memory").queryName("cap_all")
      .option("checkpointLocation", s"$dir/ck")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("cap_all")
      .select(col("device_id"), col("seq"), md5(col("content")).as("fp"),
        unix_micros(col("capture_ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    // exactly-once: 3 devices x 40 seqs, no dupes
    assert(streamed.size == 120)
    assert(streamed.map(r => (r._1, r._2)).size == 120)
    // the rate limit was honored: >= ceil(40/7) = 6 micro-batches ran
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 6, s"only $batches non-empty micro-batches")
    // batch twin: spark.read on the same table, byte-identical rows
    val batch = captureOpts(spark.read).load()
      .select(col("device_id"), col("seq"), md5(col("content")).as("fp"),
        unix_micros(col("capture_ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("audio capture: chunks are REAL WAV bytes the native parser accepts") {
    val parsed = captureOpts(spark.read).load()
      .select(col("seq"),
        graft.ops.Multimodal.wavMetadata(col("content")).as("m"))
      .select(col("seq"), col("m.valid"), col("m.sample_rate"),
        col("m.channels"), col("m.n_samples"))
      .collect()
    assert(parsed.length == 120)
    parsed.foreach { r =>
      assert(r.getBoolean(1) && r.getInt(2) == 16000 && r.getInt(3) == 1)
      assert(r.getLong(4) == 50 + (r.getLong(0) % 40))
    }
  }

  test("audio capture: restart resumes from the committed offset (no re-emit)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cap2").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-audio-capture")
        .option("devices", "2").option("totalChunks", "30")
        .option("chunksPerBatch", "4")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ck")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce() // full run
    runOnce() // restart against the same checkpoint: nothing new
    val rows = spark.read.parquet(s"$dir/out")
      .select("device_id", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 60 && rows.toSet.size == 60)
  }
}
