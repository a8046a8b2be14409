package graft

import org.apache.spark.sql.functions._

/** Round-7k pins: Gini and Theil–Sen against driver brute forces,
  * Benford table consistency, S-curve shape laws, LOO-encoding
  * leakage-freedom, quantile-sketch error bounds, modularity range. */
class Round7kSpec extends SparkSpec {

  test("property: q327 Gini equals the quadratic mean-difference brute force") {
    val cnts = Tables.lineitem(spark, sf)
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .collect().map(_.getLong(1))
    // independent definition: G = Σᵢⱼ|cᵢ−cⱼ| / (2n²·mean) — the
    // mean-absolute-difference form, not the rank form the query uses
    val n = cnts.length.toLong
    val s = cnts.sum
    val sad = (for (a <- cnts; b <- cnts) yield math.abs(a - b)).sum
    val wantPpm = (BigInt(sad) * 1000000 / (2 * BigInt(n) * s)).toLong
    val row = graft.queries.Registry.byName("q327_key_skew_gini")
      .fn(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == s)
    // rank form G = (2Σi·c − (n+1)S)/(nS) and MAD form G = Σ|cᵢ−cⱼ|/(2n²·x̄)
    // are algebraically equal; integer flooring happens at different
    // points, so allow 1 ppm of flooring slack
    assert(math.abs(row.getLong(2) - wantPpm) <= 1,
      s"gini ${row.getLong(2)} vs brute $wantPpm")
  }

  test("property: q331 Theil–Sen equals a driver brute force") {
    val hours = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mh = hours.map(_._1).max
    val w = hours.filter(_._1 > mh - 168).sortBy(_._1)
    val slopes = (for {
      i <- w.indices; j <- w.indices if w(i)._1 < w(j)._1
    } yield Math.floorDiv((w(j)._2 - w(i)._2) * 1000000L,
      w(j)._1 - w(i)._1)).sorted
    val want = slopes((slopes.length + 1) / 2 - 1)
    val row = graft.queries.Registry.byName("q331_theil_sen")
      .fn(spark, sf).collect().head
    assert(row.getLong(0) == w.length.toLong)
    assert(row.getLong(1) == slopes.length.toLong)
    assert(row.getLong(2) == want)
  }

  test("q326 Benford: expected table sums to ~1e6 and obs ppm to ~1e6") {
    val rows = graft.queries.Registry.byName("q326_benford_audit")
      .fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq.sorted == (1L to 9L))
    val expSum = rows.map(_.getLong(3)).sum
    assert(expSum >= 999995L && expSum <= 1000000L, s"exp sum $expSum")
    val obsSum = rows.map(_.getLong(2)).sum
    assert(obsSum >= 999991L && obsSum <= 1000000L, s"obs sum $obsSum")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
  }

  test("q329 S-curve: monotone in s, steeper with r, Math.pow agreement") {
    val rows = graft.queries.Registry.byName("q329_lsh_scurve")
      .fn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    assert(rows.size == 36)
    // monotone non-decreasing in s for every config
    for ((b, r) <- Seq((24L, 1L), (12L, 2L), (6L, 4L), (3L, 8L)); k <- 1L to 8L)
      assert(rows((b, r, k)) <= rows((b, r, k + 1)))
    // float cross-check: exact rational P_ppm within 1 ppm of
    // floor(10⁶·(1 − (1 − s^r)^b)) — independent computation path
    for (((b, r, k), ppm) <- rows) {
      val p = 1.0 - math.pow(1.0 - math.pow(k / 10.0, r.toDouble), b.toDouble)
      assert(math.abs(ppm - math.floor(p * 1e6).toLong) <= 1,
        s"(b=$b r=$r k=$k) $ppm vs float $p")
    }
    // higher r = sharper threshold: below s=0.3 the r=8 curve sits
    // under the r=1 curve; at s=0.9 everything catches
    assert(rows((3L, 8L, 2L)) < rows((24L, 1L, 2L)))
    assert(rows((24L, 1L, 9L)) == 1000000L)
  }

  test("q328 LOO encoding: own label never leaks into its own feature") {
    val rows = graft.queries.Registry.byName("q328_loo_target_encode")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.nonEmpty)
    // brute force: per-nation (sumY, n) from the same facts
    val facts = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val st = facts.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.map(_._2).sum, xs.length.toLong))
    }
    rows.foreach { case (_, nation, y, loo) =>
      val (sy, n) = st(nation)
      val want = if (n > 1) Some((sy - y) * 1000000L / (n - 1)) else None
      assert(loo == want)
    }
  }

  test("q332 sketch: over-estimates by at most one bin width") {
    val rows = graft.queries.Registry.byName("q332_quantile_sketch_error")
      .fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 90L, 99L))
    val v = Tables.lineitem(spark, sf)
      .select(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100" +
        " as bigint)").as("v")).collect().map(_.getLong(0))
    val binW = (v.max - v.min + 1) / 256 + 1
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, "upper-edge estimate can never undershoot")
      assert(est - exact <= binW, s"err ${est - exact} > bin width $binW")
    }
    // exact side really is the order statistic
    val sorted = v.sorted
    rows.foreach { r =>
      val pos = ((r.getLong(0) * v.length + 99) / 100).toInt
      assert(r.getLong(1) == sorted(pos - 1))
    }
  }

  test("q330 modularity: in [-1e6, 1e6] ppm and communities partition nodes") {
    val row = graft.queries.Registry.byName("q330_modularity")
      .fn(spark, sf).collect().head
    val q = row.getLong(2)
    assert(q >= -1000000L && q <= 1000000L)
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }
}
