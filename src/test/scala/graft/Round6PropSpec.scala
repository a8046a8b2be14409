package graft

import graft.functions.UnicodeFoldUtil
import graft.ops.{Graph, Relational}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}

/** Property tests for the round-6 late-batch operators: the skew-join
  * equivalence, accent-fold algebra, and peel-invariants that the
  * example-based specs can't sweep. */
class Round6PropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      rng.Seed(seed + i)))

  test("property: hybridSkewJoin equals the direct join for any frame and threshold") {
    val rowsGen = Gen.listOfN(80,
      for { k <- Gen.chooseNum(1L, 8L); v <- Gen.chooseNum(0L, 999L) }
        yield (k, v))
    val dimGen = Gen.listOfN(12,
      for { k <- Gen.chooseNum(1L, 12L); s <- Gen.identifier.map(_.take(6)) }
        yield (k, s))
    for (i <- 0 until 5) {
      val big = samples(rowsGen, 1, seed = 100 + i).head.toDF("k", "v")
      val dim = samples(dimGen, 1, seed = 200 + i).head
        .distinctBy(_._1).toDF("k", "name")
      val threshold = 1L + i * 3
      val got = Relational.hybridSkewJoin(big, dim, "k", threshold)
        .as[(Long, Long, String)].collect().sorted.toSeq
      val want = big.join(dim, Seq("k"))
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(got == want, s"threshold=$threshold")
    }
  }

  test("property: accent fold is idempotent, ASCII-invariant, and mark-free") {
    val strGen = Gen.listOfN(12, Gen.oneOf(
      "café", "ÀÉÎÕÜ", "plain", "größe", "ñandú", "Škoda", "løk",
      "ascii only", "", "123!?", "ﬁß", "ā̈ẽ", "日本語", "x́ÿ"))
      .map(_.mkString(" "))
    samples(strGen, 40).foreach { s =>
      val once = UnicodeFoldUtil.fold(UTF8String.fromString(s)).toString
      val twice = UnicodeFoldUtil.fold(UTF8String.fromString(once)).toString
      assert(twice == once, s"not idempotent on: $s")
      // no combining marks survive the fold
      assert(!once.exists(c => Character.getType(c) == Character.NON_SPACING_MARK),
        s"marks left in: $once")
      // pure-ASCII input is untouched
      if (s.forall(_ < 128))
        assert(once == s, s"ASCII changed: $s -> $once")
    }
  }

  test("property: kept k-truss edges are input edges and carry their reported support") {
    // offset-form keeps a != b without suchThat retries (which can
    // collapse the whole listOfN sample to None)
    val edgeGen = Gen.listOfN(40,
      for { a <- Gen.chooseNum(1L, 11L); d <- Gen.chooseNum(1L, 4L) }
        yield (a, math.min(a + d, 12L)))
      .map(_.filter(e => e._1 != e._2))
    for (i <- 0 until 4) {
      val edges = samples(edgeGen, 1, seed = 300 + i).head.distinct
      if (edges.nonEmpty) {
        val got = Graph.kTrussEdges(edges.toDF("id_a", "id_b"), k = 3,
          rounds = 2).as[(Long, Long, Long)].collect().toSeq
        val kept = got.map(t => (t._1, t._2)).toSet
        assert(kept.subsetOf(edges.toSet))
        // reported support is the true triangle count within the kept set
        got.foreach { case (a, b, sup) =>
          val nbrs = (x: Long) => kept.collect {
            case (p, q) if p == x => q
            case (p, q) if q == x => p
          }
          val common = nbrs(a).intersect(nbrs(b)).size
          assert(common.toLong == sup, s"edge ($a,$b): $common != $sup")
        }
      }
    }
  }

  test("property: topoLayers respects edge order on random DAGs") {
    val edgeGen = Gen.listOfN(30,
      for { a <- Gen.chooseNum(1L, 15L); d <- Gen.chooseNum(1L, 4L) }
        yield (a, a + d)) // strictly forward => acyclic
    for (i <- 0 until 4) {
      val edges = samples(edgeGen, 1, seed = 400 + i).head.distinct
      val layer = Graph.topoLayers(edges.toDF("src", "dst"), "src", "dst",
        rounds = 20).as[(Long, Int)].collect().toMap
      edges.foreach { case (u, v) =>
        if (layer(u) > 0 && layer(v) > 0)
          assert(layer(u) < layer(v), s"edge $u->$v: ${layer(u)} !< ${layer(v)}")
      }
      // a forward-edge DAG over ids 1..19 peels completely in 20 waves
      assert(layer.values.forall(_ > 0))
    }
  }
}
