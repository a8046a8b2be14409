package graft.ingest

import graft.model.{IngestRecord, Segment}
import org.apache.spark.sql.{Dataset, SparkSession}

/** External-source connectors (SURVEY §2A S2-S5, T1-T4) as
  * `mapPartitions` operators behind small traits.
  *
  * Shape mirrors the reference's per-source clients but distributed:
  * one client per PARTITION (heavy init amortized — the Vosk-model
  * pattern at reference inputs/system_audio_collector.py:32), bounded
  * retries per CALL (reference inputs/youtube_audio_extractor.py:35-36),
  * and errors as data (tagged rows), never exceptions across the plan
  * (reference main.py:70-75 try/except becomes the T11 ok/err union).
  *
  * The offline build ships deterministic stubs; production swaps the
  * trait implementation — the Spark plumbing (partitioning, client
  * lifecycle, retry, routing) is identical and is what the tests pin.
  */
object Connectors {

  /** Raw transcript row as returned by a transcript API (reference
    * inputs/transcript_collector.py:27). */
  case class RawSegment(start: Double, duration: Double, text: String)

  /** One fetch outcome: ok(segments) or err(reason) — the tagged-union
    * row (T11). */
  case class FetchResult(
      video_id: String,
      status: String,
      error: Option[String],
      segments: Option[Seq[RawSegment]])

  /** S2 — transcript source. One instance per partition. */
  trait TranscriptFetcher extends Serializable {
    def fetch(videoId: String): Either[String, Seq[RawSegment]]
  }

  /** Deterministic stub: derives two segments from the id; ids
    * starting with "bad" fail — exercises the error edge. */
  class StubTranscriptFetcher extends TranscriptFetcher {
    override def fetch(videoId: String): Either[String, Seq[RawSegment]] =
      if (videoId == null) Left("null video id")
      else if (videoId.startsWith("bad")) Left(s"no transcript for $videoId")
      else Right(Seq(
        RawSegment(0.0, 1.5, s"hello from $videoId."),
        RawSegment(1.5, 2.0, s"second segment of $videoId!")))
  }

  /** T3/T4 — ASR engine over audio bytes. One instance per partition
    * (model load is the heavy init). */
  trait AsrEngine extends Serializable {
    def transcribe(audio: Array[Byte]): Either[String, (String, Seq[Segment])]
  }

  /** Deterministic stub: "transcribes" byte statistics; empty audio →
    * silence (None text — reference inputs/system_audio_collector.py:90). */
  class StubAsrEngine extends AsrEngine {
    override def transcribe(audio: Array[Byte]): Either[String, (String, Seq[Segment])] =
      if (audio == null || audio.isEmpty) Left("empty audio")
      else {
        val sec = audio.length / 32000.0 // 16 kHz mono s16le
        Right((s"stub transcript of ${audio.length} bytes",
          Seq(Segment(0.0, sec, s"stub transcript of ${audio.length} bytes"))))
      }
  }

  /** Retry a call up to `attempts` times (reference O2: retries=10). */
  @annotation.tailrec
  def withRetry[A](attempts: Int)(call: => Either[String, A]): Either[String, A] =
    call match {
      case r @ Right(_) => r
      case l @ Left(_) => if (attempts <= 1) l else withRetry(attempts - 1)(call)
    }

  /** S3 — batch transcript collection: embarrassingly-parallel fetch
    * with per-partition client init and per-row error routing.
    * Scale: repartition bounds the number of concurrent clients; no
    * shuffle besides the optional repartition. */
  def fetchTranscripts(
      videoIds: Dataset[String],
      newFetcher: () => TranscriptFetcher,
      retries: Int = 3,
      parallelism: Option[Int] = None): Dataset[FetchResult] = {
    import videoIds.sparkSession.implicits._
    val parted = parallelism.map(videoIds.repartition(_)).getOrElse(videoIds)
    parted.mapPartitions { ids =>
      val fetcher = newFetcher() // once per partition
      ids.map { vid =>
        withRetry(retries)(fetcher.fetch(vid)) match {
          case Right(segs) => FetchResult(vid, "ok", None, Some(segs))
          case Left(err) => FetchResult(vid, "err", Some(err), None)
        }
      }
    }
  }

  /** Audio row for ASR: id + bytes (from a binaryFile scan or a
    * path-reference join). */
  case class AudioRow(id: String, audio: Array[Byte])

  case class AsrResult(
      id: String,
      status: String,
      error: Option[String],
      text: Option[String],
      segments: Option[Seq[Segment]])

  /** T3/T4 — distributed ASR: model loaded once per partition,
    * frames streamed through the iterator (never materializes the
    * partition — the reference's bounded-memory chunk loop at
    * inputs/system_audio_collector.py:38-44, distributed). */
  def transcribeAudio(
      audio: Dataset[AudioRow],
      newEngine: () => AsrEngine,
      retries: Int = 3): Dataset[AsrResult] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      val engine = newEngine()
      rows.map { row =>
        withRetry(retries)(engine.transcribe(row.audio)) match {
          case Right((text, segs)) => AsrResult(row.id, "ok", None, Some(text), Some(segs))
          case Left(err) => AsrResult(row.id, "err", Some(err), None, None)
        }
      }
    }
  }

  /** The reference's full fallback DAG (main.py stages 2-4), batch
    * form: transcript attempt; err rows reroute through ASR; union.
    * Both branches are mapPartitions connectors — the only shuffle in
    * the whole pipeline is the caller's optional repartition. */
  def ingestWithFallback(
      spark: SparkSession,
      videoIds: Dataset[String],
      fetcher: () => TranscriptFetcher,
      asr: () => AsrEngine,
      audioFor: String => Array[Byte],
      languages: Seq[String] = Seq("en")): Dataset[IngestRecord] = {
    import spark.implicits._
    // localCheckpoint(eager) instead of cache(): the fetch runs exactly
    // once (both branches read the checkpointed blocks), and the blocks
    // are released when the Dataset is GC'd — cache() here would leak
    // into executor storage for the session lifetime on repeated calls.
    val fetched = fetchTranscripts(videoIds, fetcher).localCheckpoint(eager = true)
    val ok = fetched.filter(_.status == "ok").map { r =>
      val segs = r.segments.get.map(s => Segment(s.start, s.duration, s.text))
      IngestRecord(
        id = "yt_" + r.video_id,
        source_type = graft.model.Schema.SourceYoutubeTranscript,
        text = Some(segs.map(_.text).mkString("\n").trim),
        segments = Some(segs),
        binary_path = None,
        meta = Map("video_id" -> r.video_id, "languages" -> languages.mkString(",")))
    }
    val fallback = transcribeAudio(
      fetched.filter(_.status == "err").map(r => AudioRow(r.video_id, audioFor(r.video_id))),
      asr)
    val err = fallback.map { r =>
      IngestRecord(
        id = "yt_" + r.id,
        source_type = graft.model.Schema.SourceYoutubeStt,
        text = r.text,
        segments = None, // STT path carries no timing (speech_to_text.py:94)
        binary_path = Some(s"audio/${r.id}.wav"),
        meta = Map("provider" -> "stub", "status" -> r.status))
    }
    ok.union(err)
  }
}
