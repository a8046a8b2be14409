package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Round-7: the ANN index persistence lifecycle delivers its plan
  * promises — the loaded-index search matches the in-memory search
  * bit-for-bit and never retrains. */
class Round7Spec extends SparkSpec {

  test("q290: loaded-index IVF search is bit-equal to literal-centroid search") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainCentroids(emb, 16)
    val dir = s"${graft.queries.Scratch.dir(spark, sf)}/round7spec_ivf"
    Similarity.centroidIndexDF(spark, cents).write.mode("overwrite").parquet(dir)
    val queries = emb.where(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromIndex = Similarity.ivfTopKFromIndex(emb, queries, 5,
      spark.read.parquet(dir))
    val direct = Similarity.ivfTopKWith(emb, queries, 5, cents)
    val a = rows(fromIndex)
    assert(a.nonEmpty && a == rows(direct))
  }

  test("q290: the search plan scans the index table and is cartesian-free") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val dir = s"${graft.queries.Scratch.dir(spark, sf)}/round7spec_ivf2"
    Similarity.centroidIndexDF(spark, Similarity.trainCentroids(emb, 16))
      .write.mode("overwrite").parquet(dir)
    val p = Similarity.ivfTopKFromIndex(emb, emb.where(col("vec_id") < 20), 5,
        spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    // two parquet scans: the corpus and the PERSISTED index — the
    // centroids arrive from storage, not recomputation (no Lloyd
    // aggregation subtree, whose signature is a posexplode generator)
    assert(p.linesIterator.count(_.contains("FileScan parquet")) >= 2,
      p.take(3000))
    assert(p.contains("round7spec_ivf2"), p.take(3000))
    assert(!p.contains("Generate posexplode"), p.take(3000))
    // the only nested-loop is the one-row centroid-array broadcast
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }
}
