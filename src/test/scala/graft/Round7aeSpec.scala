package graft

import org.apache.spark.sql.functions._

/** Round-7ae pins: the random walks against an exact driver replay,
  * the Gini stump against exhaustive driver search, and the format
  * fidelity ledger's all-green law. */
class Round7aeSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q401 walks equal an exact driver replay") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs: Seq[(Long, Long)] = li.groupBy(_._1).values.toSeq
      .flatMap { grp =>
        val ps = grp.map(_._2).distinct.toSeq
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }.distinct
    // mirror the r8 degree cap: each node keeps only its 64 smallest
    // neighbors (the power-law-hub guard the query now applies)
    val nbrs = pairs.groupBy(_._1)
      .map { case (s2, v) => s2 -> v.map(_._2).sorted.take(64).toVector }
    val want = nbrs.keys.filter(_ % 25 == 0).toSeq.sorted.flatMap { seed =>
      (0 to 3).map { w =>
        var cur = seed; var ck = seed
        for (t <- 1 to 6) {
          val nb = nbrs(cur)
          cur = nb((hashLong(s"$seed#$w#$t#$cur") % nb.length).toInt)
          ck += cur * (t + 1)
        }
        (seed, w.toLong, cur, ck)
      }
    }
    val got = graft.queries.Registry.byName("q401_random_walks")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want && got.nonEmpty)
  }

  test("property: q402 stump equals exhaustive driver search and never hurts purity") {
    val pts = Tables.documents(spark, sf)
      .select(col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = pts.length.toLong; val p = pts.map(_._2).sum
    val cands = pts.map(_._1).distinct.sorted.flatMap { t =>
      val (l, r) = pts.partition(_._1 <= t)
      if (r.isEmpty) None
      else {
        val (nl, pl) = (l.length.toLong, l.map(_._2).sum)
        val (nr, pr) = (r.length.toLong, r.map(_._2).sum)
        val score = (pl * pl + (nl - pl) * (nl - pl)) * 1000000L / nl +
          (pr * pr + (nr - pr) * (nr - pr)) * 1000000L / nr
        Some((t, nl, pl, nr, pr, score))
      }
    }
    val best = cands.maxBy(c => c._6 * 1048576L + (1048575L - c._1))
    val got = graft.queries.Registry.byName("q402_gini_stump")
      .fn(spark, sf).collect()
    assert(got.length == 1)
    val g = got.head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
      g.getLong(4), g.getLong(5)) == best)
    // splitting never hurts: weighted purity ≥ the no-split baseline
    // (up to the two floor divisions)
    val baseline = (p * p + (n - p) * (n - p)) * 1000000L / n
    assert(g.getLong(5) >= baseline - 2)
  }

  test("law: q403 every format preserves the safe subset") {
    val rows = graft.queries.Registry.byName("q403_format_fidelity")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("csv", "json", "orc", "parquet"))
    val n = Tables.orders(spark, sf).count()
    rows.foreach { case (f, rn, ok) =>
      assert(rn == n, s"$f row count")
      assert(ok, s"$f fingerprint mismatch")
    }
  }
}
