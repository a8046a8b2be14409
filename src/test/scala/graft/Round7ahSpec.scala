package graft

import org.apache.spark.sql.functions._

/** Round-7ah pins: IPS/SNIPS against an exact driver replay and the
  * changelog-idempotence flag actually holding. */
class Round7ahSpec extends SparkSpec {

  test("property: q408 IPS/SNIPS equal an exact driver replay") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = ev.length.toLong
    val ca = ev.groupBy(_._1).map { case (a, v) => a -> v.length.toLong }
    val sup = ev.filter(e => e._1 == "click" || e._1 == "purchase")
      .map { case (a, r) => (n * 1000000L / (2 * ca(a)), r) }
    val swr = sup.map { case (w, r) => w * r }.sum
    val sw = sup.map(_._1).sum
    val sr = sup.map(_._2).sum
    val r = graft.queries.Registry.byName("q408_ips_offpolicy")
      .fn(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sup.length.toLong)
    assert(r.getLong(2) == swr / (n * 10000L), "ips")
    assert(r.getLong(3) == swr * 100L / sw, "snips")
    assert(r.getLong(4) == sr * 100L / sup.length, "direct")
    // SNIPS stays inside the support reward range (a probability-
    // weighted mean must); IPS may leave it (its weights average to
    // the target's support probability, not to 1)
    val lo = sup.map(_._2).min * 100L; val hi = sup.map(_._2).max * 100L
    assert(r.getLong(3) >= lo && r.getLong(3) <= hi)
  }

  test("law: q409 double-apply is a no-op and the flag says so") {
    val r = graft.queries.Registry.byName("q409_merge_idempotence")
      .fn(spark, sf).collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getBoolean(2), "changelog application must be idempotent")
    // and the count moved from the base as the changelog dictates:
    // -10% deletes +10% inserts over distinct custkeys
    val base = Tables.customer(spark, sf).count()
    val dels = Tables.customer(spark, sf)
      .where(col("c_custkey") % 10 === 0).count()
    val ins = Tables.customer(spark, sf)
      .where(col("c_custkey") % 10 === 2).count()
    assert(r.getLong(0) == base - dels + ins)
  }
}
