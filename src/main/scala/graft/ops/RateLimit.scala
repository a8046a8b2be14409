package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-bucket admission control replayed over historical traffic —
  * the politeness/rate-limit audit a crawler runs before committing a
  * fetch schedule (the reference throttles its transcript fetches by
  * sleeping between batches, `inputs/transcript_collector.py:71-86`;
  * this is that policy made an operator: which requests WOULD a
  * per-key bucket admit, and where does the backlog reject).
  *
  * The recurrence is inherently sequential per key (admission feeds
  * back into the level), so it cannot be a plain window — but it is
  * PER-KEY sequential, so the scale shape is: one shuffle on the key,
  * then an O(events-per-key) in-memory fold. The fold runs as a
  * column-expression `aggregate(...)` over the time-sorted event
  * array (whole-stage codegen, no UDF); per-key event counts are the
  * only memory bound, same posture as the q302/q348 trace lanes.
  *
  * All arithmetic is integer micro-tokens so the DuckDB recursive-CTE
  * oracle replays bit-exactly: refill floor(delta_us / RefillDivUs),
  * cap at CapMicro, admit iff the refilled level covers CostMicro.
  * The first event of a key sees a FULL bucket (delta 0 from level
  * CapMicro).
  */
object RateLimit {

  /** Bucket capacity: 3 tokens in micro-units. */
  val CapMicro = 3000000L

  /** Cost per admitted event: 1 token. */
  val CostMicro = 1000000L

  /** Refill: 1 micro-token per 43200 us == 1 token / 12 h — sized so
    * this corpus's ~7 h median inter-event gap exercises BOTH
    * branches (partial refills and genuine rejections). */
  val RefillDivUs = 43200L

  /** The refilled level ("filled") fragment shared by the Spark fold
    * and the DuckDB walk — lvl/dlt substituted by each caller. */
  def filledSql(lvl: String, dlt: String): String =
    s"least(CAST($CapMicro AS BIGINT), $lvl + ($dlt) div $RefillDivUs)"

  def filledDuck(lvl: String, dlt: String): String =
    s"least(CAST($CapMicro AS BIGINT), $lvl + ($dlt) // $RefillDivUs)"

  /** Pure reference step (specs + the streaming twin): given the
    * level left after the previous event and the microseconds since
    * it, returns (level after this event, admitted). */
  def step(levelMicro: Long, deltaUs: Long): (Long, Boolean) = {
    val filled = math.min(CapMicro, levelMicro + deltaUs / RefillDivUs)
    if (filled >= CostMicro) (filled - CostMicro, true) else (filled, false)
  }

  /** Per-key replay summary: n_events, admitted, rejected,
    * final_level_micro. `events` needs (keyCol, idCol, tsCol
    * timestamp); ties on ts break by id. One shuffle on keyCol. */
  def replaySummary(events: DataFrame, keyCol: String, idCol: String,
                    tsCol: String): DataFrame = {
    val arr = events
      .select(col(keyCol), struct(unix_micros(col(tsCol)).as("tu"),
        col(idCol).as("id")).as("__e"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(col("__e"))).as("__arr"))
    // state rides a named_struct: lvl, adm, rej, last event-time
    // (last < 0 marks "no previous event" => delta 0, full bucket)
    val f = filledSql("acc.lvl",
      s"CASE WHEN acc.last < 0 THEN CAST(0 AS BIGINT) ELSE e.tu - acc.last END")
    arr.withColumn("__fin", expr(
      s"""aggregate(__arr,
         |  named_struct('lvl', CAST($CapMicro AS BIGINT),
         |    'adm', CAST(0 AS BIGINT), 'rej', CAST(0 AS BIGINT),
         |    'last', CAST(-1 AS BIGINT)),
         |  (acc, e) -> named_struct(
         |    'lvl', CASE WHEN $f >= $CostMicro THEN $f - $CostMicro ELSE $f END,
         |    'adm', acc.adm + CASE WHEN $f >= $CostMicro THEN 1 ELSE 0 END,
         |    'rej', acc.rej + CASE WHEN $f >= $CostMicro THEN 0 ELSE 1 END,
         |    'last', e.tu))""".stripMargin))
      .select(col(keyCol), col("n_events"),
        col("__fin.adm").as("admitted"), col("__fin.rej").as("rejected"),
        col("__fin.lvl").as("final_level_micro"))
  }

  /** The DuckDB recursive-CTE walk shared by the q513/q514 oracles:
    * yields `o(user_id, event_id, tu, rn)` and `w(user_id, rn, a,
    * lvl, adm, rej, last_tu)` over `events` (rn = 0 is the seed row;
    * `a` is THIS step's admission 0/1). The enclosing WITH must be
    * RECURSIVE. */
  val duckWalkCtes: String = {
    val f = filledDuck("w.lvl",
      "CASE WHEN w.last_tu < 0 THEN 0 ELSE o.tu - w.last_tu END")
    s"""o AS (SELECT user_id, event_id, epoch_us(ts) AS tu,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |w AS (
       |  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS a,
       |    CAST($CapMicro AS BIGINT) AS lvl, CAST(0 AS BIGINT) AS adm,
       |    CAST(0 AS BIGINT) AS rej, CAST(-1 AS BIGINT) AS last_tu
       |  FROM (SELECT DISTINCT user_id FROM events)
       |  UNION ALL
       |  SELECT w.user_id, o.rn,
       |    CAST(CASE WHEN $f >= $CostMicro THEN 1 ELSE 0 END AS BIGINT),
       |    CASE WHEN $f >= $CostMicro THEN $f - $CostMicro ELSE $f END,
       |    w.adm + CASE WHEN $f >= $CostMicro THEN 1 ELSE 0 END,
       |    w.rej + CASE WHEN $f >= $CostMicro THEN 0 ELSE 1 END,
       |    o.tu
       |  FROM w JOIN o ON o.user_id = w.user_id AND o.rn = w.rn + 1)""".stripMargin
  }
}
