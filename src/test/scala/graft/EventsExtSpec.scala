package graft

import graft.ops.Events
import org.apache.spark.sql.functions._

class EventsExtSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sequentialFunnel honors event order, unlike plain conditional counts") {
    // user 1: signup -> click -> purchase (full funnel)
    // user 2: click BEFORE signup, no click after -> stops at step 1
    // user 3: no signup -> never enters
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 11:00:00"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.sequentialFunnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("step").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "signup", 2L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("resampleLocf fills gaps with zero counts and carries values forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:20:00"), 7.0),
      // 2-hour gap: buckets 01:00 and 02:00 empty
      (1L, ts("2024-01-01 03:30:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = Events.resampleLocf(ev, "user_id", "ts", "value", 3600)
      .orderBy("bucket")
      .select(date_format(col("bucket"), "HH:mm").as("b"),
        col("n_events"), col("locf_value"))
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(
      ("00:00", 2L, 12.0),   // two events summed
      ("01:00", 0L, 12.0),   // gap: zero events, value carried
      ("02:00", 0L, 12.0),
      ("03:00", 1L, 1.0)))
  }

  test("cohortRetention buckets users by first-event week") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // Monday, cohort 2024-01-01
      (1L, ts("2024-01-10 10:00:00")),  // week offset 1
      (2L, ts("2024-01-09 10:00:00")),  // cohort 2024-01-08
      (2L, ts("2024-01-24 10:00:00"))   // week offset 2
    ).toDF("user_id", "ts")
    val out = Events.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 2L, 1L)))
  }
}
