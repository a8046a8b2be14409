package graft

import org.apache.spark.sql.functions._

/** Round-7t pins: clock-skew against a driver replay, the streaming
  * fingerprint against its batch twin, Pareto-head sufficiency. */
class Round7tSpec extends SparkSpec {

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)

  test("property: q364 clock skew equals a driver replay") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.map { case (u, id, us) =>
      val jit = if (id % 7 == 0) hash32(s"$id#skew") % 200000000000L else 0L
      (u, id, us - jit)
    }.groupBy(_._1).flatMap { case (u, xs) =>
      val sorted = xs.sortBy(_._2)
      val steps = sorted.zip(sorted.drop(1))
      val back = steps.filter { case (a, b) => b._3 < a._3 }
      if (back.nonEmpty)
        Some(u -> ((steps.length.toLong, back.length.toLong,
          back.map { case (a, b) => a._3 - b._3 }.max)))
      else None
    }
    val got = graft.queries.Registry.byName("q364_clock_skew_audit")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q365 streaming fingerprint == batch fingerprint (q360 v1 lane)") {
    val stream = graft.queries.Registry
      .byName("q365_streaming_fingerprint")
      .fn(spark, sf).collect().head
    val batch = graft.queries.Registry.byName("q360_table_fingerprint")
      .fn(spark, sf).collect()
      .find(_.getString(0) == "v1").get
    assert(stream.getLong(0) == batch.getLong(1))
    assert(stream.getLong(1) == batch.getLong(2))
    assert(stream.getString(2) == batch.getString(3))
  }

  test("q366 Pareto head: smallest prefix reaching 80%, verified by replay") {
    val rev = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }.toSeq
    val sorted = rev.sortBy { case (k, v) => (-v, k) }.map(_._2)
    val total = sorted.sum
    val cums = sorted.scanLeft(0L)(_ + _).drop(1)
    val n80 = cums.indexWhere(c => c * 100 >= total * 80) + 1L
    val row = graft.queries.Registry.byName("q366_pareto_concentration")
      .fn(spark, sf).collect().head
    assert(row.getLong(0) == rev.length.toLong)
    assert(row.getLong(1) == total)
    assert(row.getLong(2) == n80)
    assert(row.getLong(3) == n80 * 1000000L / rev.length)
    // sufficiency + minimality of the head
    assert(cums(n80.toInt - 1) * 100 >= total * 80)
    if (n80 > 1) assert(cums(n80.toInt - 2) * 100 < total * 80)
  }
}
