package graft

import org.apache.spark.sql.functions._

/** Round-7ai pin: the learned-index fit against a driver OLS replay
  * and the error bound actually bounding. */
class Round7aiSpec extends SparkSpec {

  test("property: q410 segment fits equal a driver OLS replay and errors bound") {
    val keys = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val lo = keys.head; val hi = keys.last
    val rows = keys.zipWithIndex.map { case (k, i) =>
      (k, (i + 1).toLong, (k - lo) * 16 / (hi - lo + 1)) }
    val want = rows.groupBy(_._3).map { case (seg, v) =>
      val n = v.length.toDouble
      val sx = v.map(_._1.toDouble).sum; val sy = v.map(_._2.toDouble).sum
      val sxx = v.map(p => p._1.toDouble * p._1).sum
      val sxy = v.map(p => p._1.toDouble * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val maxErr = v.map(p =>
        math.abs(p._2 - (slope * p._1 + icept))).max
      seg -> ((v.length.toLong,
        BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        maxErr))
    }
    val got = graft.queries.Registry.byName("q410_learned_index")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDouble(2)),
        r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (seg, (n, slope, maxErr)) =>
      val (gn, gs, ge) = got(seg)
      assert(gn == n, s"seg $seg count")
      assert((gs - slope).abs.toDouble <= 1e-5, s"seg $seg slope $gs vs $slope")
      assert(math.abs(ge - maxErr) <= 0.01 + maxErr * 1e-6, s"seg $seg err")
      // the learned-index contract: the reported window really bounds
      // every key's displacement in this segment (replayed above) and
      // stays far below the segment size (else the model is useless)
      assert(ge <= gn.toDouble, s"seg $seg bound larger than segment")
    }
  }
}
