package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("pr-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val li = graft.Tables.lineitem(spark, d).select("l_orderkey", "l_partkey")
    val e = li.withColumnRenamed("l_partkey", "src")
      .join(li.withColumnRenamed("l_partkey", "dst"), "l_orderkey")
      .where(col("src") =!= col("dst")).select("src", "dst")
    time("edge build count")(println(s"[prprobe] n_edges=${e.count()}"))
    val laid = time("layoutEdges")(graft.ops.Graph.layoutEdges(e, "src", "dst", layoutKey = "dst"))
    time("pageRank 3 iters on laid")(
      graft.ops.Graph.pageRank(laid, "src", "dst", iters = 3, assumeLaidOut = true).count())
    time("full q145 again")(graft.SparkEntry.queries("q145_pagerank")(spark, d).count())
    spark.stop()
  }
}
