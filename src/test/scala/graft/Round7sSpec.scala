package graft

import org.apache.spark.sql.functions._

/** Round-7s pins: centroid similarity and daily quantiles against
  * driver replays, survivor-policy dominance laws. */
class Round7sSpec extends SparkSpec {

  test("property: q361 centroid cos2 equals a BigInt driver replay") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"),
        expr("transform(embedding, x ->" +
          " cast(round(cast(x as double) * 1000, 0) as bigint))"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val cents = emb.groupBy(_._1).map { case (l, xs) =>
      l -> xs.map(_._2).transpose.map(_.sum).toArray
    }
    val want = (for {
      la <- cents.keys; lb <- cents.keys if la < lb
    } yield {
      val dot = cents(la).zip(cents(lb))
        .map { case (a, b) => BigInt(a) * b }.sum
      val na = cents(la).map(x => BigInt(x) * x).sum
      val nb = cents(lb).map(x => BigInt(x) * x).sum
      (la, lb) -> ((dot.signum.toLong,
        (BigInt(dot.signum) * (dot * dot * 1000000 / (na * nb))).toLong))
    }).toMap
    val got = graft.queries.Registry.byName("q361_centroid_similarity")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty && got == want)
    got.values.foreach { case (_, c2) =>
      assert(c2.abs <= 1000000L, "cos2 is bounded by 1")
    }
  }

  test("property: q362 daily quantiles equal driver order statistics") {
    val v = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(expr("unix_micros(ts) div 86400000000"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = v.groupBy(_._1).map { case (day, xs) =>
      val sorted = xs.map(_._2).sorted
      def q(p: Long) = sorted(((p * sorted.length + 99) / 100).toInt - 1)
      day -> ((sorted.length.toLong, q(50), q(90)))
    }
    val got = graft.queries.Registry.byName("q362_daily_quantiles")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q363 survivor policies: keep-longest dominates, cluster counts agree") {
    val rows = graft.queries.Registry.byName("q363_survivor_policy")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows.size == 3)
    val n = rows.values.map(_._1).toSet
    assert(n.size == 1, "every policy keeps one survivor per cluster")
    // keep-longest maximizes kept bytes by definition
    assert(rows("keep_longest")._2 >= rows("keep_first")._2)
    assert(rows("keep_longest")._2 >= rows("keep_max_tokens")._2)
    rows.values.foreach { case (_, kept, ppm) => assert(kept > 0 && ppm > 0) }
  }
}
