package graft

import graft.queries.{QueriesRound8k, Registry}
import org.apache.spark.sql.functions._

/** Laws for the round-8k batch that the oracle equality alone doesn't
  * state: JL distortion concentration, the homoglyph plant/restore
  * laws, and FK-pair dominance in the schema matcher.
  */
class Round8kSpec extends SparkSpec {

  test("q462 JL audit: sign matrix is balanced and ratios concentrate") {
    // the literal matrix both engines share: 16 rows x 64 signs
    assert(QueriesRound8k.jlSigns.length === 16)
    assert(QueriesRound8k.jlSigns.forall(_.length === 64))
    assert(QueriesRound8k.jlSigns.flatten.forall(s => s == 1 || s == -1))
    val out = Registry.byName("q462_jl_projection_audit").fn(spark, sf)
      .agg(avg("ratio_ppm"), count(lit(1))).collect().head
    val mean = out.getDouble(0); val n = out.getLong(1)
    assert(n === 400L)
    // E[ratio] = 1; the mean over 400 pairs sits well inside +-15%
    assert(mean > 850000 && mean < 1150000, s"mean ratio $mean")
  }

  test("q464 homoglyph laws: plant count exact, skeleton restores") {
    val planted = Tables.documents(spark, sf)
      .where(col("doc_id") % 9 === 0)
      .groupBy("source").agg(count(lit(1)).as("want"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Registry.byName("q464_homoglyph_detect").fn(spark, sf)
      .collect()
    for (r <- out) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_spoofed_docs") === planted.getOrElse(src, 0L),
        s"source $src")
      assert(r.getAs[Long]("skeleton_restores") === 1L, s"source $src")
    }
  }

  test("q461 schema matcher: FK pair dominates decoys") {
    val rows = Registry.byName("q461_schema_match").fn(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    val fk = rows(("customer.c_custkey", "orders.o_custkey"))
    val decoy1 = rows(("customer.c_custkey", "orders.o_orderpriority"))
    assert(fk > 0, "FK pair shares no sampled values")
    assert(fk > decoy1, s"fk=$fk decoy=$decoy1")
  }
}
