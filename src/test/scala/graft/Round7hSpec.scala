package graft

import org.apache.spark.sql.functions._

/** Round-7h pins: feature hashing, linear scorer, Markov stationary
  * vector, and inter-arrival dispersion against driver brute forces. */
class Round7hSpec extends SparkSpec {

  private def md5HashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
      .split("\\s+").filter(_.nonEmpty).toSeq

  private lazy val docTokens: Seq[(Long, String, Seq[String])] =
    Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), tokenize(r.getString(2))))
      .toSeq

  private def features(toks: Seq[String]): Map[Long, Long] =
    toks.groupBy(t => md5HashLong(t) % 64)
      .map { case (dim, ts) =>
        dim -> ts.map(t => md5HashLong("s:" + t) % 2 * 2 - 1).sum
      }.filter(_._2 != 0L)

  test("property: q315 feature hashing equals a driver brute force") {
    val want = docTokens.map { case (id, _, toks) =>
      val f = features(toks)
      id -> ((f.size.toLong, f.values.map(math.abs).sum,
        f.values.map(v => v * v).sum,
        f.map { case (dim, v) => (dim + 1) * v }.sum))
    }.toMap
    val got = graft.queries.Registry.byName("q315_feature_hashing")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("property: q316 linear scorer equals a driver brute force") {
    val want = docTokens
      .map { case (id, lang, toks) =>
        // q316 keeps zero-valued dims (no HAVING) — same math either
        // way since they contribute 0 to the dot product
        val score = features(toks).map { case (dim, f) =>
          (md5HashLong("w:" + dim) % 2001 - 1000) * f
        }.sum
        (lang, score)
      }
      .groupBy(_._1).map { case (lang, xs) =>
        val kept = xs.count(_._2 > 0).toLong
        lang -> ((xs.size.toLong, kept, xs.map(_._2).sum,
          kept * 1000000L / xs.size))
      }
    val got = graft.queries.Registry.byName("q316_linear_scorer")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("property: q317 Markov stationary vector equals a driver replay") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getString(3).head)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val t = xs.map(_._2).sortBy(x => (x._1, x._2)).map(_._3)
      t.zip(t.drop(1))
    }
    val c = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val outc = c.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val states = (c.keys.map(_._1) ++ c.keys.map(_._2)).toSeq.distinct
    var v = states.map(_ -> 200000L).toMap
    for (_ <- 1 to 3) {
      v = c.toSeq.groupBy(_._1._2).map { case (dst, edges) =>
        dst -> edges.map { case ((src, _), cnt) =>
          v(src) * cnt / outc(src)
        }.sum
      }
    }
    val got = graft.queries.Registry.byName("q317_markov_stationary")
      .fn(spark, sf).collect()
      .map(r => r.getString(0).head -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == v)
  }

  test("property: q318 dispersion equals a driver brute force") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val want = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val t = xs.map(_._2).sortBy(identity).map(_._1)
      val d = t.zip(t.drop(1)).map { case (a, b) => (b - a) / 1000000L }
      if (d.isEmpty) None else {
        val n = d.length.toLong; val sd = d.sum
        val sdd = d.map(x => x * x).sum
        Some(u -> ((n, sd / n,
          if (n >= 2 && sd > 0) Some((n * sdd - sd * sd) * 100 / ((n - 1) * sd))
          else None)))
      }
    }
    val got = graft.queries.Registry.byName("q318_interarrival_dispersion")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.nonEmpty && got == want)
  }
}
