package graft

import graft.model.Segment
import graft.ops.SegmentMerge
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the mechanism that
  * removes the per-query shuffle for repeatedly-joined 100 TB fact
  * tables. Both sides written bucketed on the join key join WITHOUT
  * any exchange. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    lineitem.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      joined.count()
      // the join itself must not shuffle either side: the only allowed
      // exchange keys are downstream aggregations, and this plan has none
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // result parity with the unbucketed join
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class SegmentMergeSpec extends SparkSpec {
  import spark.implicits._

  test("SegmentMerge aggregator assembles utterances across any partitioning") {
    val segs = Seq(
      ("v1", Segment(0.0, 1.0, "hello")),
      ("v1", Segment(1.2, 0.8, "world")),   // gap 0.2 <= 0.5 -> merge
      ("v1", Segment(5.0, 1.0, "new")),     // gap 3.0 -> new utterance
      ("v1", Segment(6.1, 0.4, "utterance")),
      ("v2", Segment(0.0, 2.0, "solo")))
    // shuffle the input order and spread across partitions: the
    // aggregator must be order-insensitive until finish()
    val ds = spark.createDataset(scala.util.Random.shuffle(segs)).repartition(5)
    val merged = ds.groupByKey(_._1).mapValues(_._2)
      .agg(SegmentMerge.merged(gapSec = 0.5))
      .collect().toMap
    assert(merged("v1").map(_.text) == Seq("hello world", "new utterance"))
    val first = merged("v1").head
    assert(first.start == 0.0 && first.duration == 2.0)
    assert(merged("v2") == Seq(Segment(0.0, 2.0, "solo")))
  }
}
