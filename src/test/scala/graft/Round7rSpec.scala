package graft

import org.apache.spark.sql.functions._

/** Round-7r pins: winsorization against a driver order statistic,
  * Simpson signs against BigInt cross products, proximity against a
  * driver span scan, and the fingerprint invariance laws. */
class Round7rSpec extends SparkSpec {

  test("property: q357 winsorization equals a driver order-statistic replay") {
    val v = Tables.lineitem(spark, sf)
      .select(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100" +
        " as bigint)")).collect().map(_.getLong(0))
    val sorted = v.sorted
    def pos(p: Long) = ((p * v.length + 99) / 100).toInt
    val lo = sorted(pos(1) - 1)
    val hi = sorted(pos(99) - 1)
    val w = v.map(x => math.max(lo, math.min(hi, x)))
    val row = graft.queries.Registry.byName("q357_winsorize")
      .fn(spark, sf).collect().head
    assert(row.getLong(0) == v.length.toLong)
    assert(row.getLong(1) == lo && row.getLong(2) == hi)
    assert(row.getLong(3) == v.count(_ < lo).toLong)
    assert(row.getLong(4) == v.count(_ > hi).toLong)
    assert(row.getLong(5) == v.sum / v.length)
    assert(row.getLong(6) == w.sum / w.length)
    // winsorizing can only pull the mean toward the middle
    assert(math.abs(row.getLong(6) - (lo + hi) / 2) <=
      math.abs(row.getLong(5) - (lo + hi) / 2) + 1)
  }

  test("property: q358 covariance signs equal BigInt cross products") {
    val o = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sgn(xs: Array[(Long, Long, Long)]): Long = {
      val n = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._2)).sum
      val sy = xs.map(x => BigInt(x._3)).sum
      val sxy = xs.map(x => BigInt(x._2) * x._3).sum
      (n * sxy - sx * sy).signum.toLong
    }
    val pooled = sgn(o)
    val want = o.groupBy(_._1).map { case (nat, xs) =>
      nat -> ((xs.length.toLong, sgn(xs)))
    }
    val got = graft.queries.Registry.byName("q358_simpsons_paradox")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (nat, (n, cs, ps, rev)) =>
      assert((n, cs) == want(nat))
      assert(ps == pooled)
      assert(rev == (cs != 0 && cs == -ps))
    }
  }

  test("property: q359 proximity equals a driver span scan") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ops.Text.tokens(col("text")))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val want = docs.flatMap { case (id, toks) =>
      val pa = toks.zipWithIndex.collect { case ("join", i) => i.toLong }
      val pb = toks.zipWithIndex.collect { case ("hash", i) => i.toLong }
      if (pa.nonEmpty && pb.nonEmpty) {
        val span = (for (a <- pa; b <- pb) yield math.abs(a - b)).min
        Some(id -> ((pa.length.toLong, pb.length.toLong, span,
          1000000L / (1 + span))))
      } else None
    }.toMap
    val got = graft.queries.Registry.byName("q359_proximity_search")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q360 fingerprints: reorder-invariant, drift-sensitive") {
    val rows = graft.queries.Registry.byName("q360_table_fingerprint")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(rows("v1") == rows("v1_reordered"),
      "same rows must fingerprint identically under any order")
    assert(rows("v1")._2 != rows("v2_drifted")._2 ||
      rows("v1")._3 != rows("v2_drifted")._3,
      "planted drift must change the fingerprint")
    assert(rows.values.forall(_._1 > 0))
  }
}
