package graft

import org.apache.spark.sql.functions._

/** Round-7g pins: event 3-grams and CUPED against driver brute
  * forces, Heaps-curve invariants. */
class Round7gSpec extends SparkSpec {

  test("property: q312 event 3-grams equal a driver brute force") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getString(3).head)))
    val byGram = ev.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val trace = xs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).mkString
      (0 to trace.length - 3).map(i => (trace.substring(i, i + 3), u))
    }.groupBy(_._1).map { case (g, occ) =>
      g -> ((occ.map(_._2).distinct.length.toLong, occ.length.toLong))
    }
    val want = byGram.toSeq
      .sortBy { case (g, (su, _)) => (-su, g) }.take(20).toMap
    val got = graft.queries.Registry.byName("q312_event_3grams")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q313 Heaps curve: monotone, and the k=10 point is the full corpus") {
    val rows = graft.queries.Registry.byName("q313_heaps_law")
      .fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10))
    rows.zip(rows.drop(1)).foreach { case (a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4)
    }
    val docs = Tables.documents(spark, sf)
      .select(explode(graft.ops.Text.tokens(col("text"))).as("t"),
        col("doc_id"))
    val totalToks = docs.count()
    val vocab = docs.select("t").distinct().count()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.last == ((10, nDocs, totalToks, vocab)))
  }

  test("property: q314 CUPED equals a driver brute force (floor-div exact)") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00").getTime * 1000L
    val ev = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def md5HashLong(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val pu = ev.groupBy(_._1).map { case (u, xs) =>
      val pre = xs.filter(_._2 < cut).map(_._3).sum / 100L
      val post = xs.filter(_._2 >= cut).map(_._3).sum
      (u, pre, post, md5HashLong(s"$u#arm") % 2)
    }.toSeq
    val n = pu.length.toLong
    val sx = pu.map(_._2).sum; val sy = pu.map(_._3).sum
    val sxx = pu.map(t => t._2 * t._2).sum
    val sxy = pu.map(t => t._2 * t._3).sum
    val theta = Math.floorDiv((n * sxy - sx * sy) * 1000000L,
      n * sxx - sx * sx)
    val xbar = sx * 1000000L / n
    val want = pu.groupBy(_._4).map { case (arm, xs) =>
      val adj = xs.map(t => t._3 * 1000000L -
        Math.floorDiv(theta * (t._2 * 1000000L - xbar), 1000000L))
      arm -> ((xs.length.toLong,
        xs.map(_._3).sum * 1000000L / xs.length,
        Math.floorDiv(adj.sum, xs.length.toLong)))
    }
    val got = graft.queries.Registry.byName("q314_cuped_ab")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.nonEmpty && got == want)
  }
}
