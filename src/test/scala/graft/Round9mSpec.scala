package graft

import graft.queries.Registry
import graft.ops.FixedPoint

/** q515/q516 re-verified against pure-Scala replays (no Spark
  * expressions, no DuckDB in the reference path).
  */
class Round9mSpec extends SparkSpec {

  test("q515 Fellegi-Sunter scores equal the pure-Scala replay") {
    val parts = Tables.part(spark, sf)
      .selectExpr("p_partkey", "p_brand", "p_size", "p_type",
        "split(p_name, ' ')[0]",
        "CAST(round(p_retailprice * 100) AS BIGINT) div 10000")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    val n = parts.length.toLong
    val uDen = n * (n - 1)
    def uNum(f: ((Long, String, Int, String, String, Long)) => Any): Long =
      parts.groupBy(f).values.map(g => g.size.toLong * (g.size - 1)).sum
    val (uType, uTok, uPrice) = (uNum(_._4), uNum(_._5), uNum(_._6))
    def wA(m: Long, u: Long): Long = FixedPoint.log2MicroLong(
      FixedPoint.ratioFp20Long(m * uDen - 1000 * u, 1000 * u))
    def wD(m: Long, u: Long): Long = FixedPoint.log2MicroLong(
      FixedPoint.ratioFp20Long((uDen - u) * 1000 - uDen * (1000 - m),
        uDen * (1000 - m)))
    val pairs = for {
      g <- parts.groupBy(p => (p._2, p._3)).values.toSeq
      a <- g; b <- g if a._1 < b._1
    } yield {
      val s = (if (a._4 == b._4) wA(900, uType) else -wD(900, uType)) +
        (if (a._5 == b._5) wA(950, uTok) else -wD(950, uTok)) +
        (if (a._6 == b._6) wA(800, uPrice) else -wD(800, uPrice))
      (a._1, b._1, s)
    }
    val want = pairs.sortBy(p => (-p._3, p._1, p._2)).take(50)
      .map(p => (p._1, p._2, p._3))
    val got = Registry.byName("q515_fellegi_sunter").fn(spark, sf)
      .select("key_a", "key_b", "score_microbits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // non-vacuity: the top-50 must mix full and partial agreement
    assert(want.map(_._3).distinct.size > 1,
      "all top-50 scores identical — weights not discriminating")
  }

  test("q516 SAX words equal the pure-Scala replay") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "day(ts)").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .filter(_._2 <= 28)
    val users = evs.map(_._1).distinct.sorted
    val cnt = evs.groupBy(e => (e._1, (e._2 - 1) / 7))
      .view.mapValues(_.size.toLong).toMap
    val segVals = for (u <- users; s <- 0 to 3)
      yield (u, s, cnt.getOrElse((u, s), 0L))
    val all = segVals.map(_._3).sorted
    val m = all.size.toLong
    def bp(k: Long): Long = {
      // min c with cum*4 >= k*m over the value histogram == the
      // ceil(k*m/4)-th order statistic of the sorted values
      val rank = (k * m + 3) / 4
      all((rank - 1).toInt)
    }
    val (q1, q2, q3) = (bp(1), bp(2), bp(3))
    val words = users.map { u =>
      u -> (0 to 3).map { s =>
        val c = cnt.getOrElse((u, s), 0L)
        if (c <= q1) "a" else if (c <= q2) "b" else if (c <= q3) "c" else "d"
      }.mkString
    }.toMap
    val sizes = words.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q516_sax_motifs").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == words)
    got.foreach(g => assert(g._3 == sizes(g._2)))
    assert(words.values.toSeq.distinct.size > 1,
      "single SAX motif — breakpoints not separating users")
  }
}
