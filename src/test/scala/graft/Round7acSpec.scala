package graft

import org.apache.spark.sql.functions._

/** Round-7ac pins: the stats ledger against a driver replay, the
  * seam-merge path of incremental sessionization actually firing,
  * and the coordinated-sampling pushdown identity. */
class Round7acSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q395 stats ledger equals a driver replay") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,4)") * 10000).cast("long")
          .as("pu"))
      .collect()
    def repl[T](vals: Seq[T])(implicit ord: Ordering[T]) =
      (vals.distinct.size.toLong, vals.min.toString, vals.max.toString)
    val want = Map(
      "o_orderkey" -> repl(rows.map(_.getLong(0)).toSeq),
      "o_custkey" -> repl(rows.map(_.getLong(1)).toSeq),
      "o_orderstatus" -> repl(rows.map(_.getString(2)).toSeq),
      "o_orderpriority" -> repl(rows.map(_.getString(3)).toSeq),
      "o_totalprice_u" -> repl(rows.map(_.getLong(4)).toSeq))
    val got = graft.queries.Registry.byName("q395_analyze_stats")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getString(4), r.getString(5), r.getLong(3))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (c, (ndv, mn, mx, nullPpm)) =>
      assert((ndv, mn, mx) == want(c), s"col $c")
      assert(nullPpm == 0L, s"col $c nulls")
    }
  }

  test("property: q396 exercises the seam merge (some user bridges the midpoint)") {
    // correctness vs the global pass is the ORACLE's job (the hash
    // gate compares incremental output to direct single-pass SQL);
    // here pin that the merge branch actually fires on this data —
    // otherwise the equivalence would be vacuously about disjoint
    // halves
    val ev = Tables.events(spark, sf)
      .select(col("user_id").cast("string"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the query's adversarial cut: latest intra-session event time
    val mid = ev.groupBy(_._1).values.flatMap { v =>
      val s = v.map(_._2).toSeq.sorted
      s.zip(s.drop(1)).collect { case (p, t) if t - p <= 1800000000L => t }
    }.max
    def sessions(xs: Seq[Long]): Seq[(Long, Long)] = {
      if (xs.isEmpty) return Nil
      val s = xs.sorted
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = s.head; var last = s.head
      s.tail.foreach { t =>
        if (t - last > 1800000000L) { out += ((start, last)); start = t }
        last = t
      }
      out += ((start, last))
      out.toSeq
    }
    val byUser = ev.groupBy(_._1).map { case (u, v) => u -> v.map(_._2) }
    val merges = byUser.count { case (_, ts) =>
      val a = sessions(ts.filter(_ < mid).toSeq)
      val b = sessions(ts.filter(_ >= mid).toSeq)
      a.nonEmpty && b.nonEmpty && b.head._1 - a.last._2 <= 1800000000L
    }
    assert(merges > 0, "no user bridges the seam — equivalence vacuous")
    // and the incremental output equals the direct driver sessionization
    val want = byUser.map { case (u, ts) =>
      val ss = sessions(ts.toSeq)
      u -> ((ss.length.toLong, ss.map(s2 => s2._2 - s2._1).sum))
    }
    val got = graft.queries.Registry.byName("q396_incremental_sessions")
      .fn(spark, sf).collect()
      .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("law: q397 pushdown identity holds and the estimate is sane") {
    val r = graft.queries.Registry.byName("q397_coordinated_sampling")
      .fn(spark, sf).collect().head
    assert(r.getBoolean(6), "sample-then-join != join-then-sample")
    assert(r.getLong(2) > 0, "empty sample")
    assert(r.getLong(4) == r.getLong(3) * 16)
    assert(r.getLong(5) == math.abs(r.getLong(3) * 16 - r.getLong(1))
      * 1000000L / r.getLong(1))
    // a 1/16 key sample of thousands of orders estimates within 50%
    assert(r.getLong(5) <= 500000L, s"err ${r.getLong(5)} ppm")
  }
}
