package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end timing for the current suffixArrayRanks. */
object SaProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("sa-probe3").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(d: String): Double = {
      val t0 = System.nanoTime()
      graft.ops.Dedup.suffixArrayRanks(
        graft.Tables.documents(spark, d), "doc_id", "text", 64).count()
      (System.nanoTime() - t0) / 1e9
    }
    run("/root/testdata/sf0.001") // warm
    for (i <- 1 to 4) {
      val t = run(dir)
      println(f"[saprobe3] run$i: $t%.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
