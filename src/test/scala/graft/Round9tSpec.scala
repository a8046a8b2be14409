package graft

import graft.queries.Registry

/** q526/q527 re-verified against pure-Scala replays. */
class Round9tSpec extends SparkSpec {

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.map(c =>
        if (c.isDigit || (c >= 'a' && c <= 'z')) c else ' ')
      .split("\\s+").filter(_.nonEmpty).toSeq

  test("q526 Kaplan-Meier equals the pure-Scala life-table replay") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "day(ts)", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val perUser = evs.groupBy(_._1).values.map { g =>
      val fails = g.filter(e => e._3 == "error" && e._4 % 23 == 0).map(_._2)
      if (fails.nonEmpty) (fails.min, true) else (g.map(_._2).max, false)
    }.toSeq
    val total = perUser.size.toLong
    var s = 1000000L
    var exited = 0L
    val want = (1 to 30).map { t =>
      val d = perUser.count(u => u._1 == t && u._2).toLong
      val c = perUser.count(u => u._1 == t && !u._2).toLong
      val nRisk = total - exited
      exited += d + c
      if (nRisk > 0 && d > 0) s = s * (nRisk - d) / nRisk
      (t.toLong, nRisk, d, c, s)
    }
    val got = Registry.byName("q526_kaplan_meier").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(want.map(_._3).sum > 0, "no failures — KM vacuous")
    assert(want.map(_._4).sum > 0, "no censoring — KM degenerates to cohort")
    assert(want.last._5 < 1000000L, "survival never dropped")
  }

  test("q527 TextRank equals the pure-Scala weighted-PageRank replay") {
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(r => normToks(r.getString(0)))
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { tks =>
      tks.sliding(2).filter(_.size == 2).foreach { p =>
        if (p(0) != p(1)) {
          edges((p(0), p(1))) = edges.getOrElse((p(0), p(1)), 0L) + 1
          edges((p(1), p(0))) = edges.getOrElse((p(1), p(0)), 0L) + 1
        }
      }
    }
    val wout = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val words = wout.keySet.toSeq.sorted
    var r = words.map(_ -> 1000000L).toMap
    val hist = scala.collection.mutable.ArrayBuffer(r)
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case ((a, b), w) =>
        in(b) = in.getOrElse(b, 0L) + r(a) * w / wout(a)
      }
      r = words.map(w => w -> (150000L + 850L * in.getOrElse(w, 0L) / 1000L))
        .toMap
      hist += r
    }
    val want = words
      .map(w => (w, hist(0)(w), hist(1)(w), hist(2)(w), hist(3)(w)))
      .sortBy(x => (-x._5, x._1)).take(10)
    val got = Registry.byName("q527_textrank_keywords").fn(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(want.map(_._5).distinct.size > 1, "flat ranks — graph degenerate")
  }
}
