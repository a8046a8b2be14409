package graft

import graft.ops.Similarity

/** Round-10 persist-hygiene pins (r9 verdict #5, the q452 lesson
  * generalized): ops that persist must either release on every path
  * (trainCentroids, now via try/finally) or document the caller
  * contract and survive the bench's block sweep (ivfTopK).
  */
class Round10Spec extends SparkSpec {

  test("trainCentroids releases its own persist on the success path") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cents = Similarity.trainCentroids(Tables.embeddings(spark, sf), 8)
    assert(cents.nonEmpty)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "trainCentroids left persisted blocks behind")
  }

  test("trainCentroids releases its persist on the failure path too") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[Exception] {
      // nCells over an empty corpus: the seed require fires INSIDE the
      // persist scope
      Similarity.trainCentroids(
        Tables.embeddings(spark, sf).where("vec_id < 0"), 8)
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "trainCentroids leaked its persist on the exception path")
  }

  test("the IVF lane leaves no blocks after the bench sweep (caller contract)") {
    val fn = SparkEntry.queries("q54_ivf_topk")
    fn(spark, sf).count()
    // the Bench/Verify clearBlocks discipline — the documented release
    // path for ivfTopK's long-lived persist
    graft.ops.Checkpoints.muteWarnings()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "blocks survived the sweep")
  }
}
