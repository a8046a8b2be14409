package graft

import graft.queries.Registry
import graft.ops.FixedPoint

/** q533-q535 re-verified against pure-Scala replays. */
class Round9zSpec extends SparkSpec {

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.map(c =>
        if (c.isDigit || (c >= 'a' && c <= 'z')) c else ' ')
      .split("\\s+").filter(_.nonEmpty).toSeq

  private lazy val docs = Tables.documents(spark, sf)
    .selectExpr("lang", "source", "n_chars", "text").collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))

  test("q533 IPW effect equals the pure-Scala replay") {
    val cells = docs.groupBy(_._1).values.map { g =>
      def exp(t: (String, String, Long, String)) =
        t._2.drop(3).toInt % 2 == 0
      val a = g.count(t => exp(t) && t._3 >= 300).toLong
      val e = g.count(exp).toLong
      val c = g.count(t => !exp(t) && t._3 >= 300).toLong
      val u = g.count(t => !exp(t)).toLong
      (a, e, c, u, e + u)
    }.toSeq
    val n = cells.map(_._5).sum
    val wtT = cells.map { case (a, e, _, _, ns) =>
      a * ns * 1000000 / math.max(e, 1L) }.sum
    val wtC = cells.map { case (_, _, c, u, ns) =>
      c * ns * 1000000 / math.max(u, 1L) }.sum
    val row = Registry.byName("q533_ipw_effect").fn(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("ipw_ate_ppm") == wtT / n - wtC / n)
    val ta = cells.map(_._1).sum; val te = cells.map(_._2).sum
    val tc = cells.map(_._3).sum; val tu = cells.map(_._4).sum
    assert(row.getAs[Long]("naive_diff_ppm") ==
      ta * 1000000 / te - tc * 1000000 / tu)
  }

  test("q534 dispersion equals the pure-Scala replay and flags burstiness") {
    val evs = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "day(ts)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val want = evs.groupBy(_._1).view.mapValues { g =>
      val xs = g.groupBy(t => (t._2, t._3)).values.map(_.size.toLong).toSeq
      val n = xs.size.toLong
      val sx = xs.sum; val sx2 = xs.map(x => x * x).sum
      (n, sx, (n * sx2 - sx * sx) * 1000 / ((n - 1) * sx))
    }.toMap
    val got = Registry.byName("q534_dispersion_index").fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == want)
  }

  test("q535 Bloom plan equals the pure-Scala replay with sane shapes") {
    val ln100 = FixedPoint.lnMicroLong(FixedPoint.ratioFp20Long(99, 1))
    val nTok = docs.groupBy(_._2).view
      .mapValues(_.flatMap(t => normToks(t._4)).distinct.size.toLong).toMap
    val got = Registry.byName("q535_bloom_sizing").fn(spark, sf).collect()
    got.foreach { r =>
      val n = nTok(r.getString(0))
      assert(r.getAs[Long]("n_distinct") == n)
      val m1 = (n * ln100 + 480453L - 1) / 480453L
      assert(r.getAs[Long]("m_bits_fp1") == m1)
      assert(r.getAs[Long]("k_fp1") == m1 * 693147L / (n * 1000000L))
      // shape: ~9.6 bits/key at 1% and more bits at 0.1%
      assert(m1 >= 9 * n && m1 <= 10 * n)
      assert(r.getAs[Long]("m_bits_fp01") > m1)
      assert(r.getAs[Long]("k_fp1") >= 6 && r.getAs[Long]("k_fp1") <= 7)
    }
    assert(got.nonEmpty)
  }
}
