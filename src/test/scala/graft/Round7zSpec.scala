package graft

import org.apache.spark.sql.functions._

/** Round-7z pins: DiD recovers the planted effect, RANSAC equals a
  * driver consensus replay and beats a degenerate model, and the
  * streaming conformal gate matches its batch twin cell-for-cell. */
class Round7zSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q386 DiD equals a driver panel replay and recovers the planted effect") {
    val r = graft.queries.Registry.byName("q386_diff_in_diff")
      .fn(spark, sf).collect().head
    val did = r.getLong(6)
    // the only systematic treat×post shift is the planted +20000
    // milli; md5-assignment noise at sf0.001 stays inside ±5000
    assert(math.abs(did - 20000L) <= 5000L, s"did=$did")
    // identity: did = (mt_post - mt_pre) - (mc_post - mc_pre)
    assert(did == (r.getLong(3) - r.getLong(2)) - (r.getLong(5) - r.getLong(4)))
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    // exact panel replay, driver-side
    val ev = Tables.events(spark, sf)
      .select(col("user_id").cast("string"), expr("unix_micros(ts)").as("us"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val counts = ev.groupBy(e => (e._1, e._2 >= mid))
      .map { case (k, v) => k -> v.length.toLong }
    val users = ev.map(_._1).distinct
    val cells = (for {
      u <- users; post <- Seq(false, true)
      treat = hashLong(u) % 2 == 0
      y = counts.getOrElse((u, post), 0L) +
        (if (treat && post) 20L else 0L)
    } yield ((treat, post), y)).groupBy(_._1)
      .map { case (k, v) => k -> (v.map(_._2).sum * 1000 / v.size) }
    assert(r.getLong(2) == cells((true, false)) &&
      r.getLong(3) == cells((true, true)) &&
      r.getLong(4) == cells((false, false)) &&
      r.getLong(5) == cells((false, true)))
  }

  test("property: q387 RANSAC equals a driver consensus replay") {
    val pts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = pts.map(p => p._1 -> p).toMap
    val lo = pts.map(_._1).min
    val want = (0L to 7L).flatMap { m =>
      for {
        a <- byId.get(lo + m * 3); b <- byId.get(lo + m * 4 + 17)
        if b._3 != a._3
      } yield {
        val slope = (b._2 - a._2) * 1000000L / (b._3 - a._3)
        val icept = a._2 * 1000000L - slope * a._3
        val inl = pts.count(p =>
          math.abs(p._2 * 1000000L - (slope * p._3 + icept)) <= 100000000L)
        (m, slope, icept, inl.toLong)
      }
    }
    val bk = want.map(w => w._4 * 8 + (7 - w._1)).max
    val got = graft.queries.Registry.byName("q387_ransac_fit")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == want)
    got.foreach { g =>
      assert(g._5 == (g._4 * 8 + (7 - g._1) == bk), s"best flag m=${g._1}") }
    assert(got.count(_._5) == 1) // exactly one winner
  }

  test("streaming: q388 conformal gate matches its batch twin") {
    val stream = graft.queries.Registry
      .byName("q388_streaming_conformal_gate")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(stream.nonEmpty)
    // batch twin: q384's machinery per language, driver-side
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("nt"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.abs(r.getLong(2) - 6 * r.getLong(3))))
    val (cal, test) = rows.partition(r => hashLong(r._1.toString) % 100 < 50)
    val scores = cal.map(_._3).sorted
    val k = math.min((scores.length + 1) * 9 / 10, scores.length)
    val qhat = scores(k - 1)
    val want = test.groupBy(_._2).map { case (lang, v) =>
      val cov = v.count(_._3 <= qhat).toLong
      (lang, v.length.toLong, cov, cov * 1000000L / v.length)
    }.toSeq.sortBy(_._1)
    assert(stream.toSeq == want)
  }
}
