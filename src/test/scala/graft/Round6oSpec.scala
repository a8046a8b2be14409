package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-6o operators: k-truss peel semantics and the cascade/card
  * invariants. */
class Round6oSpec extends SparkSpec {
  import spark.implicits._

  test("kTrussEdges keeps a 4-clique at k=4 and drops a pendant triangle chain") {
    // 4-clique {1,2,3,4}: every edge sits in 2 triangles -> survives
    // k=4 (support >= 2). Triangle {4,5,6} edges have support 1 ->
    // peeled round 1. Pendant edge (6,7) has support 0 -> peeled.
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val extra = Seq((4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))
    val e = (clique ++ extra).toDF("id_a", "id_b")
    val got = Graph.kTrussEdges(e, k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == clique.map { case (a, b) => (a, b, 2L) }.toSet)
  }

  test("kTrussEdges peel is monotone: round 2 output is a subset of round 1") {
    // chain of triangles sharing single edges: first peel removes the
    // outer triangles' weak edges, second peel can only shrink further
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("id_a", "id_b")
    def edges(rounds: Int) = Graph.kTrussEdges(e, k = 4, rounds = rounds)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val r1 = edges(1)
    val r2 = edges(2)
    assert(r2.subsetOf(r1))
  }

  test("kTrussEdges result is partition-count independent") {
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L))
    val a = Graph.kTrussEdges(base.toDF("id_a", "id_b"), 3, 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = Graph.kTrussEdges(base.toDF("id_a", "id_b").repartition(7), 3, 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("q273 cascade: stage-2 rerank only ever sees stage-1 candidates") {
    val q = graft.queries.Registry.byName("q273_retrieval_cascade")
    val out = q.fn(spark, sf)
    // every output row must carry a positive lexical match — the
    // cascade can't resurrect documents the recall stage pruned
    assert(out.where(col("matched") < 1).count() == 0L)
    assert(out.count() <= 10)
  }

  test("q274 dataset card invariants hold") {
    val r = graft.queries.Registry.byName("q274_dataset_card")
      .fn(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_docs")
    assert(n > 0)
    assert(r.getAs[Long]("n_exact_dups") >= 0 &&
      r.getAs[Long]("n_exact_dups") < n)
    assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("mean_chars") &&
      r.getAs[Long]("mean_chars") <= r.getAs[Long]("max_chars"))
    assert(r.getAs[Long]("n_tokens") > n) // multiple tokens per doc
  }
}
