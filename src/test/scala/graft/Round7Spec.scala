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

  test("q292: Bloom gate never false-negatives on planted duplicates, at any m") {
    import spark.implicits._
    // 40 existing fps; incoming = 25 EXACT dups + 25 fresh. At m=64
    // the filter saturates (plenty of false positives) — the theorem
    // under test is that a planted duplicate is ALWAYS claimed.
    val existing = (0 until 40).map(i => s"fp_$i").toDF("fp")
    val incoming = ((0 until 25).map(i => (s"fp_$i", true)) ++
      (0 until 25).map(i => (s"fresh_$i", false))).toDF("fp", "is_dup")
    for (m <- Seq(64, 1 << 10, 1 << 20)) {
      val out = graft.ops.Dedup.bloomClaimed(existing, incoming, "fp", m, 4)
        .collect().map(r => r.getAs[String]("fp") ->
          r.getAs[Boolean]("claimed")).toMap
      (0 until 25).foreach(i =>
        assert(out(s"fp_$i"), s"false negative at m=$m for fp_$i"))
    }
    // and at a roomy m the fresh fps are (almost surely) not claimed
    val roomy = graft.ops.Dedup.bloomClaimed(existing, incoming, "fp", 1 << 20, 4)
      .where(!col("is_dup") && col("claimed")).count()
    assert(roomy == 0L)
  }

  test("q291: zorder layout scans no more than linear and covers all matches") {
    val rows = graft.queries.Registry.byName("q291_zorder_pruning")
      .fn(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("files_scanned"), r.getAs[Long]("rows_scanned"),
          r.getAs[Long]("rows_matched"))).toMap
    val (lf, lr, lm) = rows("linear_x")
    val (zf, zr, zm) = rows("zorder")
    assert(lm == zm) // the true match count is layout-independent
    // min/max pruning is sound: scanned rows always cover the matches
    assert(lr >= lm && zr >= zm)
    assert(zf > 0 && lf > 0)
  }
}
