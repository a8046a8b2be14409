package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiling main for the optimization rounds (not
  * part of the library surface): isolates one declared query — warm
  * JIT, run it N times with the bench's timed action (count), once
  * with the noop sink (guide §1.4: computes every column, no sink
  * cost), and dump the formatted plan to a file for plans/r12/.
  *
  * usage: runMain graft.tools.OptProbe <query> [sfDir] [planOut] [runs]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val planOut = if (args.length > 2) Some(args(2)) else None
    val runs = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("opt-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // JIT/codegen warmup on the small SF so the timed runs measure the
    // plan, not class loading (the bench's warmup discipline)
    try fn(spark, "/root/testdata/sf0.001").count()
    catch { case t: Throwable => System.err.println(s"[warmup] $t") }
    def clear(): Unit = {
      graft.ops.Checkpoints.muteWarnings()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
    }
    clear()
    val ts = (1 to runs).map { i =>
      spark.sparkContext.setJobDescription(s"$name run $i")
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      clear()
      t
    }
    // one noop-sink run: forces every column of every row (guide §1.4)
    spark.sparkContext.setJobDescription(s"$name noop")
    val t0 = System.nanoTime()
    val df = fn(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val tNoop = (System.nanoTime() - t0) / 1e9
    planOut.foreach { p =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(p)
      try w.println(plan) finally w.close()
    }
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"[optprobe] $name runs=" + ts.map(f).mkString(",") +
      s" min=${f(ts.min)} noop=${f(tNoop)} sf=$dir")
    spark.stop()
  }
}
