package graft

import graft.queries.Registry

/** q528/q529 re-verified against pure-Scala replays. */
class Round9vSpec extends SparkSpec {

  private def md5Long(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("q528 ring assignment equals the pure-Scala replay") {
    def ring(shards: Int): Seq[(Long, Int)] =
      (for (sh <- 0 until shards; v <- 0 until 64)
        yield (md5Long(s"shard$sh#$v"), sh)).sortBy(_._1)
    val (r8, r9) = (ring(8), ring(9))
    def pick(r: Seq[(Long, Int)], h: Long): Int = {
      val idx = r.count(_._1 < h)
      if (idx >= r.size) r.head._2 else r(idx)._2
    }
    val hs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(r => md5Long(r.getLong(0).toString))
    val n = hs.length.toLong
    val mvMod = hs.count(h => h % 8 != h % 9).toLong
    val mvRing = hs.count(h => pick(r8, h) != pick(r9, h)).toLong
    val ringMax = hs.groupBy(h => pick(r9, h)).values.map(_.size).max.toLong
    val modMax = hs.groupBy(_ % 9).values.map(_.size).max.toLong
    val row = Registry.byName("q528_consistent_hash_rebalance")
      .fn(spark, sf).collect().head
    assert(row.getAs[Long]("n_keys") == n)
    assert(row.getAs[Long]("moved_mod_ppm") == mvMod * 1000000 / n)
    assert(row.getAs[Long]("moved_ring_ppm") == mvRing * 1000000 / n)
    assert(row.getAs[Long]("ring_max_load_ppm") == ringMax * 1000000 / n)
    assert(row.getAs[Long]("mod_max_load_ppm") == modMax * 1000000 / n)
    // the POINT of the lane: the ring must move far less than mod-N
    assert(mvRing * 4 < mvMod, "ring moved >= 25% of mod-N — ring broken")
  }

  test("q529 modularity equals the pure-Scala LPA + Newman replay") {
    val li = Tables.lineitem(spark, sf)
      .where("l_orderkey % 7 = 0").select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.toSeq.groupBy(_._1).values
    val dPairs = byOrder.flatMap { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet // directed distinct, both directions
    // LPA, 2 synchronous rounds (count desc, label asc argmax)
    var label = dPairs.map(_._1).map(x => x -> x).toMap
    for (_ <- 1 to 2) {
      val votes = dPairs.toSeq.groupBy(_._2).map { case (id, es) =>
        val cnt = es.groupBy(e => label(e._1)).view.mapValues(_.size).toMap
        id -> cnt.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
      label = label.map { case (id, old) => id -> votes.getOrElse(id, old) }
    }
    val ed = dPairs.filter(p => p._1 < p._2)
    val m = ed.size.toLong
    val eIn = ed.count(p => label(p._1) == label(p._2)).toLong
    val deg = ed.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dC = deg.toSeq.groupBy(kv => label(kv._1)).view
      .mapValues(_.map(_._2).sum).toMap
    val sumDc2 = dC.values.map(x => x * x).sum
    val nComm = dC.size.toLong
    val sNum = 4 * m * eIn - sumDc2
    val qPpm = math.signum(sNum) * (math.abs(sNum) * 1000000 / (4 * m * m))
    val row = Registry.byName("q529_lpa_modularity").fn(spark, sf)
      .collect().head
    assert(row.getAs[Long]("m") == m)
    assert(row.getAs[Long]("e_in") == eIn)
    assert(row.getAs[Long]("n_comm") == nComm)
    assert(row.getAs[Long]("q_ppm") == qPpm)
    assert(nComm > 1, "single community — modularity vacuous")
  }
}
