package graft

import graft.queries.Registry

/** Token-bucket lanes (q513/q514) re-verified against a pure-Scala
  * replay of the recurrence — no Spark expressions and no DuckDB in
  * the reference path (the Round8/9PropSpec discipline) — plus the
  * stream ≡ batch consistency law.
  */
class Round9lSpec extends SparkSpec {

  private lazy val evRows: Seq[(Long, Long, Long)] =
    Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** Pure replay: per user, (n, admitted, rejected, finalLevel). */
  private lazy val replay: Map[Long, (Long, Long, Long, Long)] =
    evRows.groupBy(_._1).map { case (u, rows) =>
      var lvl = graft.ops.RateLimit.CapMicro
      var last = -1L
      var adm = 0L; var rej = 0L
      rows.sortBy(r => (r._3, r._2)).foreach { case (_, _, tu) =>
        val delta = if (last < 0) 0L else tu - last
        val (nl, a) = graft.ops.RateLimit.step(lvl, delta)
        lvl = nl; last = tu
        if (a) adm += 1 else rej += 1
      }
      u -> (rows.size.toLong, adm, rej, lvl)
    }

  test("q513 batch fold equals the pure-Scala bucket replay") {
    val got = Registry.byName("q513_token_bucket_replay").fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == replay)
    // non-vacuity: the corpus must exercise BOTH branches
    assert(replay.values.map(_._2).sum > 0, "no admissions")
    assert(replay.values.map(_._3).sum > 0,
      "no rejections — the refill constants stopped stressing the bucket")
  }

  test("q514 streaming decisions fold to the q513 batch summary") {
    val dec = Registry.byName("q514_streaming_token_bucket").fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = dec.groupBy(_._1)
    val folded = byUser.map { case (u, rows) =>
      u -> (rows.size.toLong,
        rows.map(_._3).sum,
        rows.size.toLong - rows.map(_._3).sum)
    }
    assert(folded == replay.map { case (u, (n, a, r, _)) => u -> (n, a, r) })
    // per-event level trace must match the replay's step-by-step walk
    val want = evRows.groupBy(_._1).flatMap { case (u, rows) =>
      var lvl = graft.ops.RateLimit.CapMicro
      var last = -1L
      rows.sortBy(r => (r._3, r._2)).map { case (_, id, tu) =>
        val delta = if (last < 0) 0L else tu - last
        val (nl, a) = graft.ops.RateLimit.step(lvl, delta)
        lvl = nl; last = tu
        (u, id) -> (if (a) 1L else 0L, nl)
      }
    }
    val gotByEvent = dec.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(gotByEvent == want)
  }
}
