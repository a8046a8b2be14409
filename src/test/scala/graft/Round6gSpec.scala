package graft

import graft.ops.{Graph, Similarity}
import org.apache.spark.sql.functions._

/** Round-6g operators: weighted SSSP (bounded Bellman-Ford) and the
  * Gram-matrix power iteration. Each is checked against an in-test
  * reference implementation (Dijkstra over an adjacency map; dense
  * double-precision power iteration). */
class Round6gSpec extends SparkSpec {
  import spark.implicits._

  // ---- Graph.weightedSssp ------------------------------------------

  private def sssp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                   rounds: Int): Map[Long, Long] =
    Graph.weightedSssp(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      seeds.toDF("id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: Bellman-Ford with exactly `rounds` relaxations (the
    * operator's contract — min cost over paths of ≤ rounds edges). */
  private def refBf(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                    rounds: Int): Map[Long, Long] = {
    val minW = edges.groupBy(e => (e._1, e._2))
      .map { case (k, es) => k -> es.map(_._3).min }
    var dist = seeds.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = minW.toSeq.flatMap { case ((s, d), w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    dist
  }

  test("weightedSssp matches reference Bellman-Ford, takes the cheap 2-hop over the expensive 1-hop") {
    // 1 -> 3 direct costs 10; 1 -> 2 -> 3 costs 2 + 3 = 5
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L))
    val got = sssp(edges, Seq(1L), rounds = 3)
    assert(got == refBf(edges, Seq(1L), 3))
    assert(got(3L) == 5L)
    assert(got(4L) == 6L)
  }

  test("weightedSssp collapses multi-edges to the minimum weight and honors the round bound") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 4L), (2L, 3L, 1L), (3L, 4L, 1L))
    // 1 round: only node 2 reached (via the min multi-edge)
    assert(sssp(edges, Seq(1L), 1) == Map(1L -> 0L, 2L -> 4L))
    // unreached nodes are absent, not infinite
    assert(!sssp(edges, Seq(1L), 1).contains(4L))
    assert(sssp(edges, Seq(1L), 3) == refBf(edges, Seq(1L), 3))
  }

  test("weightedSssp multi-seed takes the nearest seed and seeds stay at distance 0") {
    val edges = Seq((1L, 2L, 5L), (9L, 2L, 1L), (2L, 1L, 1L))
    val got = sssp(edges, Seq(1L, 9L), 2)
    assert(got(1L) == 0L && got(9L) == 0L)
    assert(got(2L) == 1L) // via seed 9, not seed 1
    assert(got == refBf(edges, Seq(1L, 9L), 2))
  }

  test("weightedSssp rejects negative weights") {
    intercept[IllegalArgumentException] {
      sssp(Seq((1L, 2L, -1L)), Seq(1L), 1)
    }
  }

  // ---- Similarity.gramPowerIteration -------------------------------

  test("gramPowerIteration converges to the dense dominant eigendirection") {
    // synthetic corpus with a planted dominant direction along dims
    // (0,1): vectors ~ a*(0.8, 0.6, 0, 0) + small deterministic noise
    val n = 60; val dims = 4
    val rows = (0 until n).map { i =>
      val a = 1.0 + (i % 5) * 0.1
      val noise = Array.tabulate(dims)(j => ((i * 7 + j * 13) % 11 - 5) * 0.01)
      val base = Array(0.8 * a, 0.6 * a, 0.0, 0.0)
      Tuple1(Array.tabulate(dims)(j => (base(j) + noise(j)).toFloat))
    }
    val df = rows.toDF("embedding")
    val got = Similarity.gramPowerIteration(df, "embedding", dims, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = (1 to dims).map(got(_).toDouble)

    // dense reference: quantize like the operator, build the Gram
    // matrix in doubles, run plenty of power-iteration rounds
    val q = rows.map(_._1.map(x => math.round(x.toDouble * 1000).toDouble))
    val gram = Array.tabulate(dims, dims)((i, j) =>
      q.map(r => r(i) * r(j)).sum)
    var ref = Array.fill(dims)(1.0)
    for (_ <- 1 to 50) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => gram(i)(j) * ref(j)).sum)
      val m = w.map(math.abs).max
      ref = w.map(_ / m)
    }
    val dot = v.zip(ref).map { case (a, b) => a * b }.sum
    val cos = dot / (math.sqrt(v.map(x => x * x).sum) *
      math.sqrt(ref.map(x => x * x).sum))
    assert(cos > 0.999, s"got direction $v vs reference ${ref.toSeq}")
    // rescale contract: max |component| is exactly 1000
    assert(v.map(math.abs).max === 1000.0)
  }
}
