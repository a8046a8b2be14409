package graft

import org.apache.spark.sql.functions._

/** Round-7m pins: attribution credit conservation, the 2-sweep
  * diameter against a driver BFS, the Bloom no-false-negative
  * theorem, and the deletion audit catching exactly the stale
  * artifact. */
class Round7mSpec extends SparkSpec {

  test("q338 attribution: credit mass is conserved exactly") {
    val rows = graft.queries.Registry.byName("q338_attribution")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    // every purchase carries exactly 10⁶ ppm of credit — split across
    // touch channels or kept whole in the direct lane
    assert(rows.map(_._3).sum == purchases * 1000000L,
      s"credit ${rows.map(_._3).sum} != ${purchases} conversions")
    assert(rows.map(_._1).contains("direct"))
  }

  test("property: q339 2-sweep diameter equals a driver BFS replay") {
    val li = Tables.lineitem(spark, sf)
      .where(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder: Seq[Seq[Long]] = li.toSeq.groupBy(_._1).values
      .map(_.map(_._2).distinct).toSeq
    val edges: Set[(Long, Long)] = byOrder.flatMap { ps =>
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def bfs4(seed: Long): Map[Long, Int] = {
      var dist = Map(seed -> 0)
      for (_ <- 1 to 4) {
        val next = dist.toSeq.flatMap { case (u, du) =>
          adj.getOrElse(u, Set.empty).map(_ -> (du + 1))
        }
        dist = (dist.toSeq ++ next).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).min }
      }
      dist
    }
    val seed = edges.map(_._1).min
    val d1 = bfs4(seed)
    val far1 = d1.toSeq.map { case (id, dd) => (-dd, id) }.min._2
    val d2 = bfs4(far1)
    val far2 = d2.toSeq.map { case (id, dd) => (-dd, id) }.min._2
    val row = graft.queries.Registry.byName("q339_diameter_2sweep")
      .fn(spark, sf).collect().head
    assert(row.getLong(0) == far1)
    assert(row.getLong(1) == far2)
    assert(row.getLong(2) == d2.values.max.toLong)
  }

  test("q340 Bloom skipping: never a false negative, overhead >= 0") {
    val rows = graft.queries.Registry.byName("q340_bloom_file_skip")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (key, bloom, exact, fp) =>
      assert(bloom >= exact,
        s"key $key: bloom reads $bloom < exact $exact — false negative")
      assert(fp == bloom - exact && fp >= 0)
    }
  }

  test("q341 deletion audit: rebuilt artifacts clean, stale cache caught") {
    val rows = graft.queries.Registry.byName("q341_deletion_audit")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val delSize = Tables.documents(spark, sf)
      .where(col("doc_id") % 37 === 0).count()
    assert(rows("postings_rebuilt") == 0L)
    assert(rows("band_index_rebuilt") == 0L)
    assert(rows("stale_cache") == delSize && delSize > 0)
  }
}
