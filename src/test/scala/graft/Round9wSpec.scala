package graft

import graft.queries.Registry

/** q530/q531 re-verified against pure-Scala replays. */
class Round9wSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.map(c =>
        if (c.isDigit || (c >= 'a' && c <= 'z')) c else ' ')
      .split("\\s+").filter(_.nonEmpty).toSeq

  private def simhash64(toks: Seq[String]): Long = {
    var h = 0L
    for (i <- 0 until 64) {
      val nibbleIdx = i / 4
      val shift = 3 - (i % 4)
      val vote = toks.map { t =>
        val nib = Integer.parseInt(md5Hex(t).substring(nibbleIdx, nibbleIdx + 1), 16)
        2 * ((nib >> shift) & 1) - 1
      }.sum
      if (vote > 0) h |= (1L << (63 - i))
    }
    h
  }

  test("q530 radius curve equals the pure-Scala simhash + CC replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), simhash64(normToks(r.getString(1)))))
    val pairs = for {
      i <- docs.indices; j <- (i + 1) until docs.length
      h = java.lang.Long.bitCount(docs(i)._2 ^ docs(j)._2)
      if h <= 3
    } yield (math.min(docs(i)._1, docs(j)._1),
      math.max(docs(i)._1, docs(j)._1), h)
    def ccStats(r: Int): (Long, Long, Long, Long) = {
      val es = pairs.filter(_._3 <= r).map(p => (p._1, p._2))
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comps = nodes.groupBy(find)
      (es.size.toLong, nodes.size.toLong, comps.size.toLong,
        if (comps.isEmpty) 0L else comps.values.map(_.size).max.toLong)
    }
    val got = Registry.byName("q530_radius_cluster_curve").fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    (1 to 3).foreach { r =>
      assert(got(r.toLong) == ccStats(r), s"radius $r mismatch")
    }
    // monotone: higher radius can only add edges
    assert(got(1L)._1 <= got(2L)._1 && got(2L)._1 <= got(3L)._1)
    assert(got(3L)._1 > 0, "no near-dup pairs at radius 3 — curve vacuous")
  }

  test("q531 water level equals the pure-Scala max-min replay") {
    val dem = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = dem.size.toLong
    val total = dem.values.sum
    val cap = total / 2
    val levels = 0L +: dem.values.toSeq.distinct.sorted
    val feas = levels.filter { v =>
      val sb = dem.values.filter(_ <= v).sum
      val nb = dem.values.count(_ <= v).toLong
      sb + (n - nb) * v <= cap
    }
    val vstar = feas.max
    val sb = dem.values.filter(_ <= vstar).sum
    val nb = dem.values.count(_ <= vstar).toLong
    val w = if (nb == n) vstar else (cap - sb) / (n - nb)
    val alloc = dem.view.mapValues(dv => math.min(dv, w)).toMap
    val sa = alloc.values.sum
    val got = Registry.byName("q531_waterfill_quota").fn(spark, sf)
      .collect()
    got.foreach { r =>
      val u = r.getLong(0)
      assert(r.getLong(1) == dem(u))
      assert(r.getLong(2) == alloc(u))
      assert(r.getLong(4) == w)
      assert(r.getLong(6) == cap - sa)
      assert(r.getBoolean(7), "allocation exceeded capacity")
    }
    assert(got.length.toLong == n)
    assert(alloc.values.sum <= cap)
    assert(dem.values.exists(_ > w), "nobody capped — knob vacuous")
  }
}
