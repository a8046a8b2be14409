package graft

import graft.ops.{Dedup, Graph}
import graft.streaming.{Sessions, ValEvent}
import org.apache.spark.sql.functions._

/** Round-6e operators: exact prefix-filter similarity join, HITS, and
  * streaming top-k. */
class Round6eSpec extends SparkSpec {
  import spark.implicits._

  // ---- prefixFilterJaccardPairs -----------------------------------

  test("prefix filtering equals brute force (completeness, word sets)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),          // J(1,2) = 3/5
      (3L, "alpha beta gamma delta"),            // J(1,3) = 1
      (4L, "zeta eta theta iota kappa"),
      (5L, "zeta eta theta iota kappa lambda"),  // J(4,5) = 5/6
      (6L, "completely different words here")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 3, 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force over all pairs at threshold 3/5
    def toks(s: String) = s.split(" ").toSet
    val m = Seq(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma epsilon",
      3L -> "alpha beta gamma delta", 4L -> "zeta eta theta iota kappa",
      5L -> "zeta eta theta iota kappa lambda",
      6L -> "completely different words here").toMap
    val want = (for {
      a <- m.keys; b <- m.keys if a < b
      ta = toks(m(a)); tb = toks(m(b))
      inter = (ta intersect tb).size; union = (ta union tb).size
      if 5 * inter >= 3 * union
    } yield (a, b)).toSet
    assert(got == want && want.contains((1L, 3L)) && want.contains((4L, 5L)))
  }

  test("prefix filter jaccard values are exact rationals rounded to 6dp") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c e")).toDF("doc_id", "text")
    val row = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 1, 2)
      .select("n_inter", "sz_a", "sz_b", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
    assert(row.toSeq == Seq((3L, 4L, 4L, 0.6)))
  }

  test("prefix filter shingle mode matches shingle-set jaccard") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven"),  // shares 5-shingle "one..five"? no: 2 shingles each, 1 shared
      (3L, "unrelated text entirely here now okay")
    ).toDF("doc_id", "text")
    // 5-shingles: doc1 {one two three four five, two three four five six}
    //             doc2 {one two three four five, two three four five seven}
    // J(1,2) = 1/3 — passes at threshold 1/3
    val got = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 1, 3,
        shingleN = 5)
      .select("id_a", "id_b", "n_inter", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 0.333333)))
  }

  // ---- hits --------------------------------------------------------

  test("hits: bipartite star — the shared authority dominates") {
    // hubs 1,2,3 all point at authority 10; hub 1 also points at 11
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L)).toDF("src", "dst")
    val r = Graph.hits(e, "src", "dst", iters = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
    // authority 10 (3 in-edges) carries max auth; 11 strictly less
    assert(r(10L)._2 == 1000000L && r(11L)._2 < 1000000L && r(11L)._2 > 0L)
    // hub 1 endorses both authorities -> max hub after normalization
    assert(r(1L)._1 == 1000000L && r(2L)._1 < 1000000L)
    // pure authorities have no out-edges -> zero hub
    assert(r(10L)._1 == 0L && r(11L)._1 == 0L)
    // pure hubs have no in-edges -> zero auth
    assert(r(1L)._2 == 0L)
  }

  test("hits is partition-order-independent (exact integer scores)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").limit(800)
    val e = li.select(col("l_orderkey").as("src"),
      (col("l_partkey") + 1000000L).as("dst"))
    val a = Graph.hits(e, "src", "dst", iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = Graph.hits(e.repartition(7), "src", "dst", iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  // ---- streamingTopK ----------------------------------------------

  test("streamingTopK final state equals the batch top-3 per key") {
    val events = (1 to 50).map { i =>
      ValEvent(key = i % 3, ts_us = i.toLong, seq = i.toLong,
        value = ((i * 37) % 100).toDouble)
    }
    val got = Sessions.streamingTopK(events.toDS(), 3).toDF()
      .groupBy("key")
      .agg(max(struct(col("n"), col("v1"), col("v2"), col("v3"))).as("s"))
      .select(col("key"), col("s.v1"), col("s.v2"), col("s.v3"))
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    val want = events.groupBy(_.key).map { case (k, es) =>
      val top = es.map(_.value).sorted(Ordering[Double].reverse).take(3)
      (k, (top.lift(0), top.lift(1), top.lift(2)))
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (a, b, c)) =>
      assert(got(k) == ((a, b, c)), s"key $k")
    }
  }

  test("streamingTopK pads with nulls below k observations") {
    val events = Seq(ValEvent(7L, 1L, 1L, 42.0))
    val got = Sessions.streamingTopK(events.toDS(), 3).collect().toSeq
    assert(got.map(p => (p.key, p.n, p.v1, p.v2, p.v3)) ==
      Seq((7L, 1L, Some(42.0), None, None)))
  }

  // ---- energyVad ---------------------------------------------------

  test("energyVad counts windows, actives, and merged segments") {
    import graft.ops.Multimodal
    // 6 windows of 4 frames: loud, loud, silent, loud, silent, partial-loud
    val samples = (Array.fill[Short](8)(300) ++ Array.fill[Short](4)(0) ++
      Array.fill[Short](4)(200) ++ Array.fill[Short](4)(0) ++
      Array.fill[Short](2)(400)) // trailing partial window (2 frames)
    val wav = Multimodal.makeWav(8000, 1, samples)
    val v = Multimodal.energyVad(wav, windowFrames = 4, threshold = 100L)
    assert(v.valid)
    assert(v.n_windows == 6L)       // 5 full + 1 partial
    assert(v.n_active == 4L)        // windows 0,1,3,5
    assert(v.n_segments == 3L)      // {0,1}, {3}, {5}
    assert(v.active_ppm == 4L * 1000000L / 6L)
  }

  test("energyVad treats corrupt or non-mono input as data, not error") {
    import graft.ops.Multimodal
    assert(!Multimodal.energyVad(Array[Byte](1, 2, 3), 4, 10L).valid)
    val stereo = Multimodal.makeWav(8000, 2, Array.fill[Short](8)(100))
    assert(!Multimodal.energyVad(stereo, 4, 10L).valid)
    // negative samples count via |s|: all -300 clears the threshold
    val neg = Multimodal.makeWav(8000, 1, Array.fill[Short](4)(-300))
    val v = Multimodal.energyVad(neg, 4, 100L)
    assert(v.valid && v.n_active == 1L && v.n_segments == 1L)
  }
}
