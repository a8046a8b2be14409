package graft

import graft.ops.Events
import org.apache.spark.sql.functions._

/** Round-7i pins: nearestValueJoin semantics on a hand-built table,
  * harmonic centrality against a driver BFS, NFC planted forms. */
class Round7iSpec extends SparkSpec {
  import spark.implicits._

  test("nearestValueJoin: exact match, tie-to-lower, empty key, below/above ends") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 149L), (3L, 10L, 150L),
      (4L, 10L, 351L), (5L, 10L, 40L), (6L, 99L, 5L))
      .toDF("id", "k", "v")
    val right = Seq((10L, 100L, 7L), (10L, 200L, 8L), (10L, 300L, 9L))
      .toDF("rk", "rv", "payload")
    val got = Events.nearestValueJoin(left, "k", "v", right, "rk", "rv",
        Seq("payload"))
      .select("id", "payload", "nearest_dist")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(1L) == ((7L, 0L)))   // exact match
    assert(got(2L) == ((7L, 49L)))  // closer below
    assert(got(3L) == ((7L, 50L)))  // equidistant -> lower value
    assert(got(4L) == ((9L, 51L)))  // closer above
    assert(got(5L) == ((7L, 60L)))  // below the whole right range
    assert(got(6L) == ((-1L, -1L))) // key with no right rows
  }

  test("property: q319 harmonic centrality equals a driver BFS") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    // r9 landmark rule: the 64 smallest md5(id) over distinct sources
    // (fixed-k budget — mirror it in pure Scala)
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val seeds = edges.map(_._1).toSeq
      .sortBy(id => md5Hex(id.toString)).take(64).toSet
    val want = seeds.map { s =>
      var dist = Map(s -> 0L)
      for (_ <- 1 to 3) {
        val next = dist.toSeq.flatMap { case (u, du) =>
          adj.getOrElse(u, Set.empty).map(_ -> (du + 1))
        }
        dist = (dist.toSeq ++ next).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      val reached = dist.filter(_._2 > 0)
      s -> ((reached.size.toLong,
        reached.values.map(d => 1000000L / d).sum))
    }.toMap
    val got = graft.queries.Registry.byName("q319_harmonic_centrality")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want.filter(_._2._1 > 0L))
  }

  test("q322 NFC audit: planted forms classify as built") {
    val rows = graft.queries.Registry.byName("q322_nfc_audit")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getLong(0)
      val (isNfc, lenRaw, lenNfc) = (r.getBoolean(1), r.getLong(2),
        r.getLong(3))
      if (key % 3 == 0) {  // decomposed: normalization shrinks by 1
        assert(!isNfc && lenNfc == lenRaw - 1)
      } else {             // precomposed / ASCII: already NFC
        assert(isNfc && lenNfc == lenRaw)
      }
    }
  }
}
