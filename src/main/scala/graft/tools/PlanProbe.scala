package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan-inspection main (not part of the library surface):
  * reconstructs one PageRank round over the laid-out co-purchase
  * graph and prints the round's executed plan (the per-round jobs a
  * final-result explain can't show — they hide behind the loop's
  * localCheckpoints).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("plan-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val edges = li.withColumnRenamed("l_partkey", "src")
      .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
      .where(col("src") =!= col("dst"))
      .select("src", "dst")
    val e = graft.ops.Graph.layoutEdges(edges, "src", "dst", layoutKey = "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .localCheckpoint()
    val ranks = nodes.withColumn("rank_micro", lit(1000000L))
    val perSrc = ranks.where(col("__deg").isNotNull)
      .select(col("id").as("src"), expr("rank_micro div __deg").as("__c"))
    val contrib = e.join(broadcast(perSrc), "src")
      .select(col("dst").as("id"), col("__c"))
    val sums = contrib.groupBy("id").agg(sum(col("__c")).as("__s"))
    val next = nodes.join(broadcast(sums), Seq("id"), "left")
      .select(col("id"), col("__deg"),
        (lit(150000L) + expr("(85 * coalesce(__s, 0L)) div 100")).as("rank_micro"))
    next.count()
    println("=== ONE-ROUND EXECUTED PLAN ===")
    println(next.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
