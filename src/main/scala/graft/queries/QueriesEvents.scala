package graft.queries

import graft.Tables._
import graft.ops.{Events, Relational}
import org.apache.spark.sql.functions._

/** Event-stream batch queries: JSON extraction, tumbling windows,
  * gap sessionization, and the as-of join (SURVEY §2B streaming/join
  * rows). Streaming (readStream) equivalents live in graft.streaming.
  */
object QueriesEvents {

  val defs: Seq[QueryDef] = Seq(

    // ---- q21: as-of join (latest order at event time per user) ------
    // Spark side: union + running-last sweep (Events.asofJoin) — one
    // key shuffle, no range explosion. Oracle: DuckDB native ASOF.
    QueryDef("q21_asof_join",
      (s, d) => {
        val ev = events(s, d).select("event_id", "user_id", "ts")
        // right side unique per (key, ts): keep the max-orderkey row
        val oByDate = {
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
            .orderBy(col("o_orderkey").desc)
          orders(s, d).select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
            .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        }
        Events.asofJoin(ev, "user_id", "ts", oByDate, "o_custkey", "o_orderdate",
            Seq("o_orderkey", "o_totalprice"))
          .select("event_id", "user_id", "o_orderkey", "o_totalprice")
          .orderBy("event_id")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |      ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1)
        |SELECT event_id, user_id, o_orderkey, o_totalprice
        |FROM events ASOF LEFT JOIN o
        |  ON events.user_id = o.o_custkey AND events.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin)),

    // ---- q22: JSON property extraction ------------------------------
    QueryDef("q22_json_props",
      (s, d) => events(s, d)
        .withColumn("k", Events.jsonInt(col("props"), "$.k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          Relational.sumExact(col("value")).as("sum_value"))
        .orderBy("event_type", "k_mod"),
      Some("""SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q23: tumbling time windows (10 min) ------------------------
    QueryDef("q23_tumbling_window",
      (s, d) => events(s, d)
        .groupBy(date_format(Events.bucketStart(col("ts"), 600),
          "yyyy-MM-dd HH:mm:ss").as("bucket_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          Relational.sumExact(col("value")).as("sum_value"))
        .orderBy("bucket_start", "event_type"),
      Some("""SELECT strftime(make_timestamp((epoch_us(ts) // 600000000) * 600000000),
        |    '%Y-%m-%d %H:%M:%S') AS bucket_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q24: gap-based sessionization (30 min) ---------------------
    QueryDef("q24_sessionize",
      (s, d) => Events.sessionStats(
          Events.sessionize(events(s, d), "user_id", "ts", 1800), "user_id", "ts")
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("start_us"), col("duration_us"))
        .orderBy("user_id", "session_id"),
      Some("""WITH x AS (
        |  SELECT user_id, ts, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (
        |  SELECT user_id, tus, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(tus) AS start_us, max(tus) - min(tus) AS duration_us
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q25: event funnel (conditional aggregation per user) -------
    QueryDef("q25_funnel",
      (s, d) => events(s, d)
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          Relational.sumExact(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0))).as("purchase_value"))
        .where(col("n_purchase") > 0)
        .orderBy("user_id"),
      Some("""SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
        |    AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY 1 HAVING sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
        |ORDER BY 1""".stripMargin)),

    // ---- q87: ordered funnel (signup -> click -> purchase, in time
    // order — unlike q25's order-free conditional counts) -------------
    QueryDef("q87_sequential_funnel",
      (s, d) => Events.sequentialFunnel(events(s, d), "user_id", "ts",
          "event_type", Seq("signup", "click", "purchase"))
        .orderBy("step"),
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts >= t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin)),

    // ---- q88: resample to 6h buckets + gap fill + LOCF ---------------
    QueryDef("q88_resample_locf",
      (s, d) => Events.resampleLocf(events(s, d), "user_id", "ts", "value", 21600)
        .select(col("user_id"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          col("n_events"), col("sum_value"), col("locf_value"))
        .orderBy("user_id", "bucket"),
      Some("""WITH b AS (SELECT user_id,
        |    make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS bucket,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM b GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 21600 SECOND)) AS bucket FROM s),
        |j AS (SELECT g.user_id, g.bucket,
        |    CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events, b.sum_value,
        |    count(b.sum_value) OVER (PARTITION BY g.user_id ORDER BY g.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket = g.bucket)
        |SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, n_events, sum_value,
        |  max(sum_value) OVER (PARTITION BY user_id, grp) AS locf_value
        |FROM j ORDER BY user_id, bucket""".stripMargin)),

    // ---- q95: trending event types per day (top-2 by count) ----------
    QueryDef("q95_trending",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = events(s, d)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("day"))
          .orderBy(col("n").desc, col("event_type").asc)
        daily.withColumn("rk", row_number().over(w).cast("bigint"))
          .where(col("rk") <= 2)
          .select("day", "event_type", "n", "rk")
          .orderBy("day", "rk")
      },
      Some("""WITH daily AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY day
        |  ORDER BY n DESC, event_type) AS BIGINT) AS rk FROM daily)
        |SELECT day, event_type, n, rk FROM r WHERE rk <= 2
        |ORDER BY day, rk""".stripMargin)),

    // ---- q96: statistical outlier flagging (3-sigma per event type) --
    QueryDef("q96_outliers",
      (s, d) => {
        // moments from EXACT decimal sums, then pure double arithmetic:
        // engine-native avg/stddev accumulate doubles in partition
        // order, and a 1-ulp drift in mu/sd can flip a row at the
        // 3-sigma boundary between engines. Exact sums make mu/sd a
        // deterministic function of the data, order-free.
        val d2 = col("value").cast("decimal(18,2)")
        val stats = events(s, d).groupBy("event_type")
          .agg(count(lit(1)).as("cnt"),
            sum(d2).cast("double").as("s1"),
            sum(d2 * d2).cast("double").as("s2"))
        val mu = col("s1") / col("cnt")
        val sd = sqrt((col("s2") - col("s1") * col("s1") / col("cnt")) /
          (col("cnt") - 1))
        events(s, d).join(broadcast(stats), Seq("event_type"))
          .where(abs(col("value") - mu) > lit(3.0) * sd)
          .select(col("event_id"), col("event_type"),
            round(col("value"), 2).as("value"),
            round((col("value") - mu) / sd, 4).as("z"))
          .orderBy("event_id")
      },
      Some("""WITH s AS (SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, round(value, 2) AS value,
        |  round((value - s1 / cnt) / sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)), 4) + 0 AS z
        |FROM events JOIN s USING (event_type)
        |WHERE abs(value - s1 / cnt) > 3.0 * sqrt((s2 - s1 * s1 / cnt) / (cnt - 1))
        |ORDER BY event_id""".stripMargin)),

    // ---- q89: weekly cohort retention --------------------------------
    QueryDef("q89_cohort_retention",
      (s, d) => Events.cohortRetention(events(s, d), "user_id", "ts")
        .orderBy("cohort_week", "week_offset"),
      Some("""WITH f AS (SELECT user_id,
        |  CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1)
        |SELECT cohort_week,
        |  date_diff('day', cohort_week, CAST(date_trunc('week', ts) AS DATE)) // 7 AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM events JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q133: cumulative distinct users per day ---------------------
    // A running COUNT(DISTINCT) is NOT a window aggregate: each user
    // counts only on their FIRST day (one hash-agg over users), daily
    // first-arrivals roll up (one hash-agg over days), and the cumsum
    // windows the O(days) rollup — never the event stream. Days with
    // activity but no new users still appear (left join to the day
    // spine), carrying the running total forward.
    QueryDef("q133_cumulative_distinct",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          col("ts").cast("date").as("day"))
        val firstDay = ev.groupBy("user_id").agg(min(col("day")).as("day"))
        val newPerDay = firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
        val spine = ev.select("day").distinct()
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("day").rowsBetween(Long.MinValue, 0)
        spine.join(newPerDay, Seq("day"), "left")
          .select(col("day"),
            coalesce(col("new_users"), lit(0L)).as("new_users"))
          .withColumn("cum_users", sum(col("new_users")).over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("new_users"), col("cum_users"))
          .orderBy("day")
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY 1),
        |n AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1),
        |s AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(s.day, '%Y-%m-%d') AS day,
        |  coalesce(n.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM s LEFT JOIN n USING (day)
        |ORDER BY day""".stripMargin)))
}
