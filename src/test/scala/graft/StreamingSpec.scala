package graft

import graft.streaming.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Word(source: String, ts: java.sql.Timestamp, word: String)
case class Rec(id: String, ts: java.sql.Timestamp, payload: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming EWMA equals the batch ordered fold (q129)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{EwmaPoint, ValEvent}
    // real events, globally time-ordered, delivered in two waves — the
    // per-key cross-batch order matches event time by construction
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .sortBy(e => (e._2, e._3))
      .map(e => ValEvent(e._1, e._2, e._3, e._4))
    val in = MemoryStream[ValEvent]
    val q = Sessions.streamingEwma(in.toDS(), 0.3, 0.7)
      .writeStream.format("memory").queryName("sewma")
      .outputMode("update").start()
    try {
      val (w1, w2) = evs.splitAt(evs.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val streamed = spark.table("sewma").as[EwmaPoint].collect()
        .groupBy(_.key).map { case (k, ps) => k -> ps.maxBy(_.n) }
      val batch = graft.queries.Registry.byName("q129_ewma").fn(spark, sf)
        .as[(Long, Long, Double)].collect()
        .map { case (u, n, e) => u -> ((n, e)) }.toMap
      assert(streamed.keySet == batch.keySet)
      for ((k, p) <- streamed) {
        val (n, rounded) = batch(k)
        assert(p.n == n, s"key $k count")
        val streamRounded = BigDecimal(p.ewma)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(streamRounded == rounded, s"key $k: $streamRounded != $rounded")
      }
    } finally q.stop()
  }

  test("assembleUtterances groups words into gap-separated session windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Word]
    val q = Sessions.assembleUtterances(in.toDF(), "source", "ts", "word", gapSec = 2.0)
      .writeStream.format("memory").queryName("utt").outputMode("complete").start()
    try {
      in.addData(
        Word("mic", ts("2024-01-01 00:00:00.0"), "xin"),
        Word("mic", ts("2024-01-01 00:00:00.8"), "chào"),
        Word("mic", ts("2024-01-01 00:00:01.5"), "bạn"),
        Word("mic", ts("2024-01-01 00:00:10.0"), "cảm"),
        Word("mic", ts("2024-01-01 00:00:11.0"), "ơn"))
      q.processAllAvailable()
      val out = spark.table("utt")
        .select("text", "n_words").as[(String, Long)].collect().sortBy(_._1)
      assert(out.toSeq == Seq(("cảm ơn", 2L), ("xin chào bạn", 3L)))
    } finally q.stop()
  }

  test("stateful utterance assembly: gap emits, watermark timeout flushes") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Utterance, WordEvent}
    val in = MemoryStream[WordEvent]
    val q = Sessions.assembleUtterancesStateful(in.toDS(), gapSec = 2.0)
      .writeStream.format("memory").queryName("sutt").outputMode("append").start()
    try {
      // two utterances in one batch: the first closes when the second starts
      in.addData(
        WordEvent("mic", ts("2024-01-01 00:00:00.0"), "xin"),
        WordEvent("mic", ts("2024-01-01 00:00:01.0"), "chào"),
        WordEvent("mic", ts("2024-01-01 00:00:10.0"), "cảm"),
        WordEvent("mic", ts("2024-01-01 00:00:11.0"), "ơn"))
      q.processAllAvailable()
      val first = spark.table("sutt").as[Utterance].collect()
      assert(first.map(_.text).toSeq == Seq("xin chào"))
      // a far-future word advances the watermark past the pending
      // utterance's horizon; the timeout flushes it on the next batch
      in.addData(WordEvent("mic", ts("2024-01-01 01:00:00.0"), "later"))
      q.processAllAvailable()
      in.addData(WordEvent("mic", ts("2024-01-01 02:00:00.0"), "more"))
      q.processAllAvailable()
      val texts = spark.table("sutt").as[Utterance].collect().map(_.text).toSet
      assert(texts.contains("cảm ơn"), s"timeout flush missing: $texts")
      val utt = spark.table("sutt").as[Utterance].collect()
        .find(_.text == "cảm ơn").get
      assert(utt.n_words == 2 && utt.end_us - utt.start_us == 1000000L)
    } finally q.stop()
  }

  test("streaming utterance assembly agrees with the batch formulation") {
    val words = Seq(
      Word("a", ts("2024-01-01 00:00:00"), "w1"),
      Word("a", ts("2024-01-01 00:00:01"), "w2"),
      Word("a", ts("2024-01-01 00:00:05"), "w3"),
      Word("b", ts("2024-01-01 00:00:00"), "w4")).toDF()
    val batch = words.withColumn("utt",
        Sessions.batchUtteranceIds(col("source"), col("ts"), 2.0))
      .groupBy("source", "utt").agg(count(lit(1)).as("n"))
      .select("source", "n").as[(String, Long)].collect().toSeq.sorted
    assert(batch == Seq(("a", 1L), ("a", 2L), ("b", 1L)))
  }

  test("dedupWithinWatermark drops repeated ids (O1 idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Rec]
    val q = Sessions.dedupWithinWatermark(in.toDF(), "id", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(
        Rec("r1", ts("2024-01-01 00:00:00"), "a"),
        Rec("r1", ts("2024-01-01 00:00:01"), "a-dup"),
        Rec("r2", ts("2024-01-01 00:00:02"), "b"))
      q.processAllAvailable()
      in.addData(Rec("r1", ts("2024-01-01 00:10:00"), "a-dup-2"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("id").as[String].collect().toSeq.sorted
      assert(ids == Seq("r1", "r2"))
    } finally q.stop()
  }

  test("windowedCounts aggregates per tumbling window under watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Rec]
    val q = Sessions.windowedCounts(
        in.toDF().withColumn("value", length(col("payload")).cast("double")),
        "ts", "value", "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      in.addData(
        Rec("a", ts("2024-01-01 00:01:00"), "xx"),
        Rec("b", ts("2024-01-01 00:05:00"), "yyy"),
        Rec("c", ts("2024-01-01 00:12:00"), "z"))
      q.processAllAvailable()
      val out = spark.table("wc").select("n", "sum_value")
        .as[(Long, Double)].collect().toSet
      assert(out == Set((2L, 5.0), (1L, 1.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Rec]
    val views = MemoryStream[Rec]
    val joined = Sessions.joinWithinInterval(
      clicks.toDF().withColumnRenamed("payload", "click_p"),
      views.toDF().withColumnRenamed("payload", "view_p")
        .withColumnRenamed("ts", "vts"),
      "id", "ts", "vts", lowerSec = 600, upperSec = 0)
    val q = joined.select("id", "click_p", "view_p")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      views.addData(
        Rec("u1", ts("2024-01-01 00:00:00"), "v-early"),
        Rec("u1", ts("2024-01-01 00:20:00"), "v-late"),
        Rec("u2", ts("2024-01-01 00:00:00"), "v-other"))
      clicks.addData(
        Rec("u1", ts("2024-01-01 00:05:00"), "c1"),   // within 10 min of v-early
        Rec("u1", ts("2024-01-01 00:25:00"), "c2"))   // within 10 min of v-late only
      q.processAllAvailable()
      val out = spark.table("ij").as[(String, String, String)].collect().toSet
      assert(out == Set(("u1", "c1", "v-early"), ("u1", "c2", "v-late")))
    } finally q.stop()
  }

  test("streaming near-dup candidates equal the batch LSH pairs") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Sessions.streamingNearDupCandidates(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("ndc").outputMode("append").start()
    try {
      // two arrival waves — pairs straddling the split must still appear
      val (first, second) = docs.splitAt(docs.length / 2)
      in.addData(first.toSeq); q.processAllAvailable()
      in.addData(second.toSeq); q.processAllAvailable()
      val streamed = spark.table("ndc").as[(Long, Long)].collect().toSet
      val batch = graft.ops.Dedup.lshCandidatePairs(
          Tables.documents(spark, sf), "doc_id", "text", 3, 8, 4)
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("foreachBatch dedup sink is idempotent across replayed keys") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dedupsink").toString + "/out"
    val in = MemoryStream[Rec]
    val q = Sessions.foreachBatchDedupSink(in.toDF(), "id", dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .start()
    try {
      in.addData(Rec("a", ts("2024-01-01 00:00:00"), "p1"),
        Rec("b", ts("2024-01-01 00:01:00"), "p2"))
      q.processAllAvailable()
      // second delivery of "a" (simulated replay) plus a new key
      in.addData(Rec("a", ts("2024-01-01 00:02:00"), "p1-dup"),
        Rec("c", ts("2024-01-01 00:03:00"), "p3"))
      q.processAllAvailable()
      val out = spark.read.parquet(dir).select("id", "payload")
        .as[(String, String)].collect().toMap
      assert(out == Map("a" -> "p1", "b" -> "p2", "c" -> "p3"))
    } finally q.stop()
  }
}
