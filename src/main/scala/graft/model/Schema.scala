package graft.model

import org.apache.spark.sql.types._

/** Time-aligned transcript unit.
  *
  * Mirrors the reference's `Segment` pydantic model
  * (reference: inputs/schema.py:6-9): `start`/`duration` are seconds.
  */
case class Segment(start: Double, duration: Double, text: String)

/** The engine's canonical row: one heterogeneous ingest record.
  *
  * Mirrors the reference's `IngestRecord` (reference:
  * inputs/schema.py:12-18). `meta` is normalized to string->string
  * (the reference allows `Dict[str, Any]`; int values like `sec`/`sr`
  * at inputs/system_audio_collector.py:93-95 are stringified — the
  * documented lossy cast, SURVEY §7.3). `meta_json` is the lossless
  * escape hatch when callers need typed metadata.
  */
case class IngestRecord(
    id: String,
    source_type: String,
    text: Option[String],
    segments: Option[Seq[Segment]],
    binary_path: Option[String],
    meta: Map[String, String])

object Schema {

  /** Observed `source_type` discriminator values (reference:
    * inputs/transcript_collector.py:31, inputs/speech_to_text.py:92,
    * inputs/system_audio_collector.py:89). */
  val SourceYoutubeTranscript = "youtube_transcript"
  val SourceYoutubeStt = "youtube"
  val SourceSystemAudio = "system_audio"

  /** Canonical declared schema — never inferred (SURVEY §1.3). */
  val segment: StructType = StructType(Seq(
    StructField("start", DoubleType, nullable = false),
    StructField("duration", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val ingest: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("source_type", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("segments", ArrayType(segment), nullable = true),
    StructField("binary_path", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Raw transcript-API row shape, pre-normalization (reference:
    * inputs/transcript_collector.py:27-33). */
  val rawTranscript: StructType = StructType(Seq(
    StructField("video_id", StringType, nullable = false),
    StructField("start", DoubleType, nullable = false),
    StructField("duration", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false)))
}
