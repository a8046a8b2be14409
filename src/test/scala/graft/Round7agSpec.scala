package graft

import org.apache.spark.sql.functions._

/** Round-7ag pins: the Brier decomposition identity and float replay,
  * and chunk-composed Holt equal to the plain sequential recursion. */
class Round7agSpec extends SparkSpec {

  test("law: q406 Brier = REL - RES + UNC within the reported gap bound") {
    val r = graft.queries.Registry.byName("q406_brier_decomposition")
      .fn(spark, sf).collect().head
    val (n, brier, rel, res, unc, gap) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0)
    assert(gap == brier - (rel - res + unc))
    // each mean floors once to milli; a 1-milli shift moves a squared
    // term by ≤ ~2·1000 milli², and four terms stack — the identity
    // holds within that analytic envelope (exactly zero in rationals)
    assert(math.abs(gap) <= 3000L, s"identity gap $gap")
    // float replay of the binned decomposition
    val rows = Tables.documents(spark, sf)
      .select(least(size(graft.ops.Text.tokens(col("text"))) * 25,
        lit(1000)).cast("long"),
        when(col("n_chars") >= 200, 1000L).otherwise(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val ob = rows.map(_._2).sum.toDouble / rows.length
    val byBin = rows.groupBy(x => math.min(x._1 / 100, 9))
    val relF = byBin.values.map { v =>
      val pb = v.map(_._1).sum.toDouble / v.size
      val o = v.map(_._2).sum.toDouble / v.size
      v.size * (pb - o) * (pb - o)
    }.sum / rows.length
    val resF = byBin.values.map { v =>
      val o = v.map(_._2).sum.toDouble / v.size
      v.size * (o - ob) * (o - ob)
    }.sum / rows.length
    val uncF = ob * (1000 - ob)
    assert(math.abs(rel - relF) <= math.max(5.0, relF * 0.02), s"rel $rel vs $relF")
    assert(math.abs(res - resF) <= math.max(5.0, resF * 0.02), s"res $res vs $resF")
    assert(math.abs(unc - uncF) <= math.max(5.0, uncF * 0.02), s"unc $unc vs $uncF")
  }

  test("property: q407 chunk-composed Holt equals the sequential recursion") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id").cast("string"), col("value").cast("double"),
        expr("unix_micros(ts)"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).map { case (u, v) =>
      val xs = v.sortBy(e => (e._3, e._4)).map(_._2)
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val lp = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (lp - l) + 0.8 * b
        l = lp
      }
      u -> ((xs.length.toLong,
        BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(l + b).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    }
    val got = graft.queries.Registry.byName("q407_holt_trend")
      .fn(spark, sf).collect()
      .map(r => r.get(0).toString -> ((r.getLong(1),
        BigDecimal(r.getDouble(2)), BigDecimal(r.getDouble(3)),
        BigDecimal(r.getDouble(4)))))
      .toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (u, (n, l, b, f)) =>
      val (gn, gl, gb, gf) = got(u)
      assert(gn == n, s"user $u n")
      // chunked float composition reorders ops vs the sequential
      // fold — equality must hold to ~1e-5 of magnitude, far tighter
      // than any semantic drift and loose enough for reordering ulps
      assert((gl - l).abs.toDouble <= 1e-5 * (1 + l.abs.toDouble), s"user $u level $gl vs $l")
      assert((gb - b).abs.toDouble <= 1e-5 * (1 + b.abs.toDouble), s"user $u trend")
      assert((gf - f).abs.toDouble <= 1e-5 * (1 + f.abs.toDouble), s"user $u forecast")
    }
  }
}
