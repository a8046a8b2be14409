package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-6p operators: topological wave layering and the audit/scoring
  * invariants. */
class Round6pSpec extends SparkSpec {
  import spark.implicits._

  test("topoLayers assigns diamond DAG waves correctly") {
    //   1 -> 2, 1 -> 3, 2 -> 4, 3 -> 4, 4 -> 5
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graph.topoLayers(e, "src", "dst", rounds = 4)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("topoLayers reports cycle members as layer -1, upstream still peels") {
    // 1 -> 2 -> 3 -> 2 cycle; 1 peels in wave 1, the cycle never does
    val e = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.topoLayers(e, "src", "dst", rounds = 4)
      .as[(Long, Int)].collect().toMap
    assert(got(1L) == 1 && got(2L) == -1 && got(3L) == -1)
  }

  test("topoLayers bounded budget leaves deep chain tails at -1") {
    val e = (1L to 10L).sliding(2).map { w => (w(0), w(1)) }.toSeq
      .toDF("src", "dst")
    val got = Graph.topoLayers(e, "src", "dst", rounds = 3)
      .as[(Long, Int)].collect().toMap
    assert(got(1L) == 1 && got(2L) == 2 && got(3L) == 3)
    assert((4L to 10L).forall(got(_) == -1))
  }

  test("q275 audit: prediction matches the executed join exactly") {
    val r = graft.queries.Registry.byName("q275_join_cardinality_audit")
      .fn(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("prediction_exact"))
    assert(r.getAs[Long]("hot_key_pairs") <= r.getAs[Long]("predicted_pairs"))
  }

  test("q277 MaxSim: probe ranks itself first with the exact self-score") {
    val out = graft.queries.Registry.byName("q277_maxsim_late_interaction")
      .fn(spark, sf).as[(Long, Long)].collect()
    // self-match: every query sub-vector's best doc sub-vector is
    // itself, so vec 0 tops the ranking
    assert(out.head._1 == 0L)
    assert(out.map(_._2).toSeq ==
      out.map(_._2).sorted(Ordering[Long].reverse).toSeq)
  }

  test("q278 release never goes negative and keys match the true cells") {
    val out = graft.queries.Registry.byName("q278_noised_release")
      .fn(spark, sf)
    assert(out.where(col("released_count") < 0).count() == 0)
    val trueCells = Tables.documents(spark, sf)
      .select("lang", "source").distinct().count()
    assert(out.count() == trueCells)
  }
}
