package graft.queries

import graft.ingest.Connectors
import graft.ops.Multimodal
import graft.streaming.Sessions
import org.apache.spark.sql.functions._

/** Pipeline/connector/multimodal/streaming-surface queries. These are
  * not ANSI-SQL-expressible (subprocess stubs, binary parsing,
  * session windows), so the driver records the weaker rows-only check;
  * their semantics are pinned by the ScalaTest suites instead.
  */
object QueriesPipeline {

  val defs: Seq[QueryDef] = Seq(

    // ---- q64: the reference's full fallback DAG, batch form ---------
    // (main.py stages 2-4 over stub connectors: transcript attempt,
    // err rows rerouted through ASR, union — SURVEY §3.1.)
    QueryDef("q64_ingest_fallback",
      (s, _) => {
        import s.implicits._
        val ids = Seq(
          "vid000000001", "vid000000002", "bad00000001",
          "vid000000003", "bad00000002").toDS()
        val wav = Multimodal.makeWav(16000, 1, Array.fill[Short](1600)(9))
        Connectors.ingestWithFallback(s, ids,
            () => new Connectors.StubTranscriptFetcher,
            () => new Connectors.StubAsrEngine,
            audioFor = _ => wav)
          .toDF()
          .select(col("id"), col("source_type"), col("text"),
            size(coalesce(col("segments"), array())).cast("bigint").as("n_segments"),
            col("binary_path"))
          .orderBy("id")
      },
      None),

    // ---- q65: multimodal binary scan + WAV header metadata ----------
    QueryDef("q65_wav_metadata",
      (s, _) => {
        val meta = Multimodal.wavMetadata(col("content"))
        Multimodal.readBinaryDir(s, s"${QueriesIngest.FixtureDir}/wav")
          .select(
            regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
            col("length"),
            meta.getField("sample_rate").as("sample_rate"),
            meta.getField("channels").as("channels"),
            meta.getField("n_samples").as("n_samples"),
            round(meta.getField("duration_sec"), 4).as("duration_sec"))
          .orderBy("file")
      },
      None),

    // ---- q66: session-window utterance assembly (batch form) --------
    // session_window over the events table: the §3.3 Vosk utterance
    // assembly shape; the streaming variant is StreamingSpec-pinned.
    QueryDef("q66_session_windows",
      (s, d) => Sessions.assembleUtterances(
          graft.Tables.events(s, d).select(col("user_id"), col("ts"),
            col("event_type").as("word")),
          "user_id", "ts", "word", gapSec = 1800)
        .select(col("user_id"), col("n_words"),
          unix_micros(col("utterance_start")).as("start_us"))
        .orderBy("user_id", "start_us"),
      // session_window boundary is exclusive: an event at exactly
      // prev_ts + gap starts a NEW session, hence >= in the oracle
      Some("""WITH x AS (SELECT user_id, epoch_us(ts) AS tus,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, tus, CAST(sum(new_s) OVER (PARTITION BY user_id
        |  ORDER BY tus ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM x)
        |SELECT user_id, count(*) AS n_words, min(tus) AS start_us
        |FROM y GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin)))
}
