package graft

import org.apache.spark.sql.functions._

/** Round-7o pins: sampler calibration and skew what-if against driver
  * brute forces, behavioral drift vs a driver Levenshtein, and the
  * k-center greedy laws (shrinking radius + exact replay). */
class Round7oSpec extends SparkSpec {

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)

  test("property: q346 calibration equals a driver brute force; curve rises") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.length
    val mw = docs.map(_._2).max
    val inc = scala.collection.mutable.Map.empty[Long, Long]
    for (salt <- 0 until 64) {
      val ranked = docs.map { case (id, w) =>
        (id, w * 4294967296L / (hash32(s"$id#s$salt") + 1))
      }.sortBy { case (id, pr) => (-pr, id) }
      ranked.take(math.min(100, n)).foreach { case (id, _) =>
        inc(id) = inc.getOrElse(id, 0L) + 1
      }
    }
    val want = docs.groupBy { case (_, w) => math.min(9L, w * 10 / (mw + 1)) }
      .map { case (dec, xs) =>
        dec -> ((xs.length.toLong, xs.map(_._2).sum / xs.length,
          xs.map(x => inc.getOrElse(x._1, 0L)).sum * 1000000L /
            (64L * xs.length)))
      }
    val got = graft.queries.Registry.byName("q346_sampler_calibration")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == want)
    // the calibration law: heavier docs sample much more often
    assert(got(9L)._3 > got(0L)._3 * 2)
  }

  test("property: q347 skew what-if equals a driver brute force") {
    val cnts = Tables.lineitem(spark, sf)
      .groupBy("l_partkey").agg(count(lit(1)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = cnts.map(_._2).sum
    val want = Seq(8L, 32L, 128L).map { p =>
      val mass = cnts.groupBy { case (k, _) =>
        ((hash32(k.toString) % p) + p) % p
      }.map(_._2.map(_._2).sum)
      p -> ((mass.max, mass.size.toLong,
        mass.max * p * 1000000L / total))
    }.toMap
    val got = graft.queries.Registry.byName("q347_shuffle_skew_whatif")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == want)
    // pigeonhole: max partition >= mean => ratio >= 1e6
    got.values.foreach { case (_, _, ratio) => assert(ratio >= 1000000L) }
  }

  test("property: q348 drift equals a driver Levenshtein replay") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        substring(col("event_type"), 1, 1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(e => (e._1, e._2 / 86400000000L)).toSeq
      .map { case ((u, day), xs) =>
        (u, day, xs.sortBy(x => (x._2, x._3)).map(_._4).mkString)
      }
      .groupBy(_._1).flatMap { case (_, days) =>
        val sorted = days.sortBy(_._2)
        sorted.zip(sorted.drop(1)).map { case ((u, d1, t1), (_, d2, t2)) =>
          (u, d1) -> ((d2, t1.length.toLong, t2.length.toLong,
            lev(t1, t2).toLong,
            lev(t1, t2).toLong * 1000000L / math.max(t1.length, t2.length)))
        }
      }
    val got = graft.queries.Registry.byName("q348_behavioral_drift")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("property: q349 k-center equals a driver greedy replay; radius shrinks") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x ->" +
        " cast(round(x * 1000, 0) as bigint))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = emb.toMap
    var chosen = Vector((emb.map(_._1).min, 0L, Option.empty[Long]))
    for (r <- 1 to 7) {
      val cand = emb.filter(e => !chosen.exists(_._1 == e._1))
        .map { case (id, q) =>
          (id, chosen.map(c => d2(q, byId(c._1))).min)
        }
      val (id, dd) = cand.maxBy { case (id, dd) => (dd, -id) }
      chosen :+= ((id, r.toLong, Some(dd)))
    }
    val got = graft.queries.Registry.byName("q349_kcenter_coreset")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toVector
    assert(got == chosen)
    // the greedy theorem: selection radii never increase
    val radii = got.flatMap(_._3)
    radii.sliding(2).foreach {
      case Vector(a, b) => assert(b <= a)
      case _ =>
    }
  }
}
