package graft

import org.apache.spark.sql.functions._

/** Round-7ad pins: the sketch-merge law + quantile error bound, the
  * lateness curve against a driver replay, and the encoding planner's
  * model behavior. */
class Round7adSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("law: q398 merge is exact and estimates stay within one bin width") {
    val r = graft.queries.Registry.byName("q398_sketch_merge_law")
      .fn(spark, sf).collect().head
    assert(r.getBoolean(2), "histogram merge must be lossless")
    val chars = Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0))
    val mx = chars.max
    val binW = (mx + 1 + 63) / 64
    assert(math.abs(r.getLong(3) - r.getLong(4)) <= binW, "p50 off by > bin")
    assert(math.abs(r.getLong(6) - r.getLong(7)) <= binW, "p90 off by > bin")
    // exact quantiles replayed driver-side
    val sorted = chars.sorted
    def k(p: Int) = (sorted.length * p + 99) / 100
    assert(r.getLong(4) == sorted(k(50) - 1))
    assert(r.getLong(7) == sorted(k(90) - 1))
  }

  test("property: q399 lateness curve equals a driver replay and decreases") {
    val evs = Tables.events(spark, sf)
      .select(col("event_id")).collect().map(_.getLong(0))
    val lats = evs.map(id =>
      if (id % 7 == 0) hashLong(s"$id#skew") % 200000000000L else 0L)
    val grid = Seq(0L, 3600L, 21600L, 86400L, 172800L)
    val want = grid.map(g => g ->
      lats.count(_ > g * 1000000L).toLong).toMap
    val got = graft.queries.Registry.byName("q399_lateness_curve")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == grid)
    got.foreach { case (g, n, drop, ppm) =>
      assert(n == evs.length.toLong)
      assert(drop == want(g), s"L=$g")
      assert(ppm == drop * 1000000L / n)
    }
    // monotone: more allowed lateness never drops more
    got.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ => }
    // the planted skew hits every 7th event; zero tolerance drops them
    assert(math.abs(got.head._3 - evs.count(_ % 7 == 0)) <= 1)
  }

  test("property: q400 encoding planner equals a driver replay; model behaves") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
    def bitsOf(ndv: Long) = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(ndv - 1, 1))
    def plan(vals: Seq[String], lens: Seq[Long]): (Long, Long, Long) = {
      val ndv = vals.distinct.size.toLong
      val plain = lens.sum
      val lenOf = vals.zip(lens).toMap // equal values share a length
      val distinctLen = vals.distinct.map(lenOf).sum
      (ndv, plain, distinctLen + vals.size * ((bitsOf(ndv) + 7) / 8))
    }
    val cols = Map(
      "doc_id" -> (rows.map(_.getLong(0).toString).toSeq,
        rows.map(_ => 8L).toSeq),
      "lang" -> (rows.map(_.getString(1)).toSeq,
        rows.map(_.getString(1).length.toLong).toSeq),
      "source" -> (rows.map(_.getString(2)).toSeq,
        rows.map(_.getString(2).length.toLong).toSeq),
      "text" -> (rows.map(_.getString(3)).toSeq,
        rows.map(_.getString(3).length.toLong).toSeq))
    val got = graft.queries.Registry.byName("q400_encoding_planner")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.keySet == cols.keySet)
    cols.foreach { case (c, (vals, lens)) =>
      val (ndv, plain, dict) = plan(vals, lens)
      val (n, gndv, gplain, gdict, wins) = got(c)
      assert(n == vals.size.toLong && gndv == ndv, s"$c counts")
      assert(gplain == plain, s"$c plain")
      assert(gdict == dict, s"$c dict: got $gdict want $dict")
      assert(wins == (dict < plain), s"$c winner")
    }
    // the model must prefer dictionaries for low-cardinality columns
    assert(got("lang")._5 && got("source")._5)
    assert(!got("text")._5)
  }
}
