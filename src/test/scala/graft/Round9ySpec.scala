package graft

import graft.queries.Registry

/** q532 re-verified against a pure-Scala double-sweep replay. */
class Round9ySpec extends SparkSpec {

  test("q532 double sweep equals the pure-Scala BFS replay") {
    val li = Tables.lineitem(spark, sf)
      .where("l_orderkey % 7 = 0").select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a != b)
        adj(a) = adj.getOrElse(a, Set.empty) + b
    }
    def bfs(seed: Long, hops: Int): Map[Long, Long] = {
      var dist = Map(seed -> 0L)
      var frontier = Set(seed)
      for (h <- 1 to hops if frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        next.foreach(n => dist += n -> h.toLong)
        frontier = next
      }
      dist
    }
    val seed = adj.keys.min
    val d1 = bfs(seed, 8)
    val far = d1.toSeq.sortBy { case (id, dd) => (-dd, id) }.head._1
    val d2 = bfs(far, 8)
    val row = Registry.byName("q532_double_sweep_diameter")
      .fn(spark, sf).collect().head
    assert(row.getAs[Long]("seed_id") == seed)
    assert(row.getAs[Long]("ecc_seed") == d1.values.max)
    assert(row.getAs[Long]("n_reach_seed") == d1.size.toLong)
    assert(row.getAs[Long]("far_id") == far)
    assert(row.getAs[Long]("diameter_lb") == d2.values.max)
    assert(row.getAs[Long]("n_reach_far") == d2.size.toLong)
    // the double sweep's point: sweep 2 must not shrink the bound
    assert(d2.values.max >= d1.values.max)
  }
}
