package graft

import org.apache.spark.sql.functions._

/** Round-6t: the layout-lifecycle queries actually deliver their plan
  * promises — bucketed join without Exchange, partition-pruned scan. */
class Round6tSpec extends SparkSpec {

  test("q285: the bucketed join plan has no Exchange and no Sort at query time") {
    // run the query once so the bucketed tables exist, then pin the
    // join's plan: bucket-to-bucket sort-merge, nothing to shuffle
    graft.queries.Registry.byName("q285_bucketed_join").fn(spark, sf).count()
    val db = graft.queries.Scratch.db(spark, sf)
    val j = spark.table(s"$db.q285_lineitem")
      .join(spark.table(s"$db.q285_orders"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(1500))
    if (plan.contains("SortMergeJoin")) {
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    }
  }

  test("q286: the partitioned read prunes to the filtered language") {
    graft.queries.Registry.byName("q286_partition_pruned_read")
      .fn(spark, sf).count()
    val read = spark.read
      .parquet(s"${graft.queries.Scratch.dir(spark, sf)}/q286_docs")
      .where(col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (directory
    // pruning), not as a post-scan Filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(2000))
  }

  test("q285/q286 are rerun-safe in one session (overwrite semantics)") {
    val a = graft.queries.Registry.byName("q285_bucketed_join")
      .fn(spark, sf).collect().toSeq
    val b = graft.queries.Registry.byName("q285_bucketed_join")
      .fn(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
