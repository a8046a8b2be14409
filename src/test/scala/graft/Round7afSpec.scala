package graft

import org.apache.spark.sql.functions._

/** Round-7af pins: the attention-mask plan against a driver packing
  * replay, and the SimHash radius curve's replay + monotonicity. */
class Round7afSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q404 mask plan equals a driver packing replay") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
    val b = 512L
    val want = docs.map { case (id, c) => (hashLong(id.toString) % 4, id, c) }
      .groupBy(_._1).map { case (shard, ds) =>
        var off = 0L
        val segs = ds.sortBy(_._2).flatMap { case (_, _, c) =>
          val s0 = off / b; val s1 = (off + math.max(c, 1) - 1) / b
          val out = (s0 to s1).map { s2 =>
            val len = math.min((s2 + 1) * b, off + c) -
              math.max(s2 * b, off)
            (s2, len)
          }
          off += c
          out
        }
        val bySeq = segs.groupBy(_._1).map { case (_, v) =>
          (v.size.toLong, v.map(_._2).sum, v.map(x => x._2 * x._2).sum) }
        val nSeq = bySeq.size.toLong
        shard -> ((nSeq, bySeq.map(_._1).sum, bySeq.map(_._2).sum,
          bySeq.map(_._2).sum * 1000000L / (nSeq * b),
          bySeq.map(_._3).sum * 1000000L / (nSeq * b * b)))
      }
    val got = graft.queries.Registry.byName("q404_attention_mask_plan")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want && got.nonEmpty)
    // conservation: every token lands in exactly one segment
    assert(got.values.map(_._3).sum == docs.map(_._2).sum)
    got.values.foreach { case (_, _, _, fill, dens) =>
      assert(fill <= 1000000L && dens <= fill)
    }
  }

  test("property: q405 radius curve is a faithful monotone tradeoff") {
    val rows = graft.queries.Registry.byName("q405_simhash_radius_curve")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0L to 4L))
    val (np, nd) = (rows.head._2, rows.head._3)
    rows.foreach { case (_, p2, d2, pred, tp) =>
      assert(p2 == np && d2 == nd) // one pair universe
      assert(tp <= pred && tp <= d2 && pred <= p2)
    }
    // widening the radius never loses candidates or true positives
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 >= a._4 && b._5 >= a._5)
      case _ =>
    }
    assert(nd > 0 && np > nd) // truth is non-trivial: dups and non-dups
  }
}
