package graft

import org.apache.spark.sql.functions._

/** Round-6u: ingest-robustness invariants. */
class Round6uSpec extends SparkSpec {

  test("q287 quarantine: corrupt count equals the planted every-7th rate, nothing lost") {
    val out = graft.queries.Registry.byName("q287_corrupt_quarantine")
      .fn(spark, sf)
    val r = out.agg(sum("n_lines").as("l"), sum("n_valid").as("v"),
      sum("n_corrupt").as("c")).collect()(0)
    val total = Tables.documents(spark, sf).count()
    val planted = Tables.documents(spark, sf)
      .where(col("doc_id") % 7 === 0).count()
    assert(r.getAs[Long]("l") == total)             // every line routed
    assert(r.getAs[Long]("c") == planted)           // exactly the planted set
    assert(r.getAs[Long]("v") + r.getAs[Long]("c") == total)
  }

  test("q288 evolution: pre-evolution rows are exactly the v1 generation") {
    val out = graft.queries.Registry.byName("q288_schema_evolution_read")
      .fn(spark, sf)
    val r = out.agg(sum("n_docs").as("n"), sum("n_pre_evolution").as("p"))
      .collect()(0)
    val docs = Tables.documents(spark, sf)
    assert(r.getAs[Long]("n") == docs.count())
    assert(r.getAs[Long]("p") == docs.where(col("doc_id") % 2 === 0).count())
  }

  test("q289 purity: complete pair coverage per cluster, bounds hold") {
    val out = graft.queries.Registry.byName("q289_cluster_purity")
      .fn(spark, sf)
    // every intra-cluster pair is audited: n_pairs == size choose 2
    assert(out.where(col("n_pairs") * 2 =!= col("size") * (col("size") - 1))
      .count() == 0)
    assert(out.where(col("min_jaccard_ppm") > col("mean_jaccard_ppm") ||
      col("mean_jaccard_ppm") > 1000000 || col("size") < 2).count() == 0)
    assert(out.count() > 0)
  }
}
