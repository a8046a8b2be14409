package graft

import graft.queries.Registry

/** q519-q522 re-verified against pure-Scala replays. */
class Round9pSpec extends SparkSpec {

  test("q519 MAD gate equals the pure-Scala order-statistic replay") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def medianOf(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s(((vs.size + 1) / 2) - 1) // min v with 2*cum >= n
    }
    val want = rows.groupBy(_._1).map { case (idx, g) =>
      val vs = g.map(_._2)
      val med = medianOf(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = medianOf(devs)
      val out = devs.count(dv => dv * 10000 > mad * 44478).toLong
      idx -> (vs.size.toLong, med, mad, out, out * 1000000 / vs.size)
    }
    val got = Registry.byName("q519_mad_outliers").fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
    assert(want.values.exists(_._4 > 0), "no outliers — gate vacuous")
    assert(want.values.forall(v => v._4 * 5 < v._1),
      "MAD gate flags > 20% — not an outlier gate anymore")
  }

  test("q520 Holt fold equals the pure-Scala recurrence") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "day(ts)").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byUser = evs.groupBy(_._1)
    val want = byUser.map { case (u, es) =>
      val cnt = es.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      var l = cnt.getOrElse(1, 0.0); var b = 0.0
      for (day <- 2 to 30) {
        val y = cnt.getOrElse(day, 0.0)
        val ln = 0.5 * y + 0.5 * (l + b)
        b = 0.25 * (0.5 * y + 0.5 * (l + b) - l) + 0.75 * b
        l = ln
      }
      u -> (l, b, l + 7.0 * b)
    }
    val got = Registry.byName("q520_holt_forecast").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got == want) // bit-exact double equality is the point
    assert(want.values.exists(_._2 != 0.0), "all trends zero")
  }

  test("q521 Fleiss kappa equals the pure-Scala replay") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Int = t.toLowerCase.map(c =>
      if (c.isDigit || (c >= 'a' && c <= 'z')) c else ' ')
      .split("\\s+").count(_.nonEmpty)
    val grid = docs.map { case (nc, text) =>
      val r1 = if (nc < 216) 0 else if (nc < 380) 1 else 2
      val tc = toks(text)
      val r2 = if (tc < 36) 0 else if (tc < 63) 1 else 2
      val r3 = if (text.length < 230) 0 else if (text.length < 360) 1 else 2
      (0 to 2).map(j => Seq(r1, r2, r3).count(_ == j).toLong)
    }
    val n = grid.size.toLong
    val sS = grid.map(g => g.map(x => x * x).sum).sum
    val cs = (0 to 2).map(j => grid.map(_(j)).sum)
    val sumC2 = cs.map(c => c * c).sum
    val kappa = (3 * n * sS - 9 * n * n - 2 * sumC2) * 1000000 /
      (18 * n * n - 2 * sumC2)
    val r = Registry.byName("q521_fleiss_kappa").fn(spark, sf).collect().head
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("s") == sS)
    assert(r.getAs[Long]("sum_c2") == sumC2)
    assert(r.getAs[Long]("kappa_ppm") == kappa)
    assert(kappa > 100000 && kappa < 1000000,
      s"kappa $kappa out of the meaningful band — raters degenerate")
  }

  test("q522 centroid drift equals the pure-Scala replay") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble)))
    val want = vecs.groupBy(_._2).map { case (label, vs) =>
      val dims = vs.head._3.size
      def sums(par: Long) = (0 until dims).map(i =>
        vs.filter(_._1 % 2 == par)
          .map(v => math.round(v._3(i) * 32)).sum)
      val (a, b) = (sums(0), sums(1))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na2 = a.map(x => x * x).sum
      val nb2 = b.map(x => x * x).sum
      val den = math.max(1L,
        math.floor(math.sqrt(na2.toDouble)).toLong *
          math.floor(math.sqrt(nb2.toDouble)).toLong)
      label.toLong -> (dot, na2, nb2,
        math.signum(dot) * (math.abs(dot) * 1000 / den))
    }
    val got = Registry.byName("q522_centroid_drift").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == want)
  }
}
