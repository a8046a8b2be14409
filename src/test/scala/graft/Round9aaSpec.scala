package graft

import graft.queries.Registry

/** q536 re-verified against a pure-Scala Markov-attribution replay. */
class Round9aaSpec extends SparkSpec {

  test("q536 removal effects equal the pure-Scala value-iteration replay") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // traces truncated at first purchase
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    evs.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(e => (e._2, e._3)).map(_._4)
      val fp = sorted.indexOf("purchase")
      val trace = if (fp >= 0) sorted.take(fp + 1) else sorted
      val steps = ("START" +: trace).sliding(2).map(p => (p(0), p(1))).toSeq
      val tail = if (trace.last != "purchase")
        Seq((trace.last, "END")) else Seq.empty
      (steps ++ tail).foreach(t => trans(t) = trans.getOrElse(t, 0L) + 1)
    }
    val out = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val states = (trans.keys.map(_._1) ++ trans.keys.map(_._2)).toSet
    def converge(removed: Option[String]): Long = {
      var v = states.map(st =>
        st -> (if (st == "purchase") 1000000L else 0L)).toMap
      for (_ <- 1 to 8) {
        v = states.map { st =>
          st -> (st match {
            case "purchase" => 1000000L
            case "END" => 0L
            case s if removed.contains(s) => 0L
            case s =>
              val num = trans.collect {
                case ((f, t), c) if f == s &&
                  !removed.contains(f) && !removed.contains(t) => c * v(t)
              }.sum
              if (out.contains(s)) num / out(s) else 0L
          })
        }.toMap
      }
      v("START")
    }
    val base = converge(None)
    val got = Registry.byName("q536_markov_attribution").fn(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got("base")._1 == base)
    Seq("view", "click", "signup", "error").foreach { ch =>
      val conv = converge(Some(ch))
      assert(got(ch)._1 == conv, s"channel $ch conv mismatch")
      val want = math.signum(base - conv) *
        (math.abs(base - conv) * 1000000 / math.max(base, 1L))
      assert(got(ch)._2 == want, s"channel $ch removal mismatch")
    }
    assert(got.values.map(_._2).count(_ != 0) >= 3,
      "removal effects mostly zero — attribution vacuous")
  }
}
