package graft

import graft.model.{IngestRecord, Schema}
import org.apache.spark.sql.functions._

/** End-to-end file-based streaming: JSONL records dropped into a
  * directory are picked up by readStream, normalized, and appended to
  * a JSON sink with a checkpoint — the reference's append-only
  * pipeline (K1 sink + last_run state -> checkpoint) as Structured
  * Streaming. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("readStream(json dir) -> transform -> append sink with checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("stream")
    val inDir = root.resolve("in"); val outDir = root.resolve("out")
    val ckpt = root.resolve("ckpt")
    java.nio.file.Files.createDirectories(inDir)

    def drop(name: String, recs: Seq[IngestRecord]): Unit = {
      val lines = recs.map { r =>
        Seq(r).toDS().select(to_json(struct(col("*")))).as[String].head()
      }
      java.nio.file.Files.write(inDir.resolve(name),
        lines.mkString("\n").getBytes("UTF-8"))
    }

    drop("batch1.jsonl", Seq(
      IngestRecord("a1", Schema.SourceSystemAudio, Some("xin chào."), None, None, Map()),
      IngestRecord("a2", Schema.SourceYoutubeTranscript, Some("hello there. bye."), None, None, Map())))

    val stream = spark.readStream.schema(Schema.ingest).json(inDir.toString)
      .withColumn("n_sentences",
        size(graft.ingest.Normalize.sentences(col("text"))).cast("bigint"))
      .select("id", "source_type", "n_sentences")
    val q = stream.writeStream
      .format("json")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      drop("batch2.jsonl", Seq(
        IngestRecord("a3", Schema.SourceYoutubeStt, Some("one. two. three."), None, None, Map())))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.json(outDir.toString)
      .select("id", "n_sentences").as[(String, Long)].collect().toMap
    assert(out == Map("a1" -> 1L, "a2" -> 2L, "a3" -> 3L))

    // checkpoint replay: restarting the stream re-processes nothing
    val q2 = stream.writeStream
      .format("json")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.json(outDir.toString).count() == 3)
  }
}
