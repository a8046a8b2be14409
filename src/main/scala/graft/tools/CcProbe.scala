package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for the star-CC loop (not part of the library
  * surface): times duplicateGroupsStar on a tiny pair set vs the LSH
  * pair build, to separate iteration latency from data cost.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("cc-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm the JVM/session
    spark.range(1000).selectExpr("sum(id)").collect()

    val pairs = time("lsh pairs build+collect-count") {
      val p = graft.ops.Dedup.lshCandidatePairs(
        graft.Tables.documents(spark, d), "doc_id", "text", 3, 8, 4)
        .select("id_a", "id_b")
      println(s"[ccprobe] n_pairs=${p.count()}")
      p
    }
    time("duplicateGroupsStar on lsh pairs") {
      graft.ops.Dedup.duplicateGroupsStar(pairs, maxIter = 20).count()
    }
    val tiny = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    time("duplicateGroupsStar on 3 literal pairs") {
      graft.ops.Dedup.duplicateGroupsStar(tiny, maxIter = 20).count()
    }
    spark.stop()
  }
}
