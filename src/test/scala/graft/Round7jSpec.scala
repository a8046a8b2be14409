package graft

import org.apache.spark.sql.functions._

/** Round-7j pins: temporal reachability, sample-size planner, and
  * Kaplan–Meier against driver brute forces. */
class Round7jSpec extends SparkSpec {

  test("property: q323 temporal reachability equals a driver replay") {
    val li = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1) + 1000000L,
        r.getLong(2)))
    val edges = (li.map(t => (t._1, t._2, t._3)) ++
      li.map(t => (t._2, t._1, t._3))).distinct
    val bySrc = edges.groupBy(_._1)
    var arr = edges.map(_._1).distinct
      .filter(s => s < 1000000L && s % 97 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = arr.toSeq.flatMap { case (u, au) =>
        bySrc.getOrElse(u, Array.empty[(Long, Long, Long)])
          .filter(_._3 >= au).map(e => e._2 -> e._3)
      }
      arr = (arr.toSeq ++ next).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val got = graft.queries.Registry.byName("q323_temporal_reachability")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == arr)
  }

  test("q324 planner: n_req matches the ceil formula from raw moments") {
    val byLang = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val got = graft.queries.Registry.byName("q324_sample_size_planner")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (lang, (n, varMilli, nReq)) =>
      val xs = byLang(lang).map(_._2)
      assert(n == xs.length.toLong && n >= 2)
      val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
      val varnum = n * s2 - s1 * s1; val den = n * (n - 1)
      assert(varMilli == varnum * 1000L / den)
      assert(nReq == (2401L * varnum + 1562500L * den - 1) /
        (1562500L * den))
    }
  }

  test("property: q325 Kaplan–Meier equals a driver replay") {
    val users = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(expr("min(unix_micros(ts) div 86400000000)").as("f"),
        expr("max(unix_micros(ts) div 86400000000)").as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val m = users.map(_._2).max
    val lt = users.map { case (f, l) =>
      if (l <= m - 4) (l - f, true) else (m - f, false)
    }
    val byT = lt.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.count(_._2).toLong, xs.count(!_._2).toLong))
    }
    val ts = byT.keys.toSeq.sorted
    val nRisk = ts.map(t =>
      t -> byT.filterKeys(_ >= t).values.map(v => v._1 + v._2).sum).toMap
    val want = ts.map { t =>
      var s = 1000000L
      ts.filter(u => u <= t && byT(u)._1 > 0).foreach { u =>
        s = s * (nRisk(u) - byT(u)._1) / nRisk(u)
      }
      t -> ((nRisk(t), byT(t)._1, byT(t)._2, s))
    }.toMap
    val got = graft.queries.Registry.byName("q325_kaplan_meier")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == want)
  }
}
