package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage probe for q582's post-SA stages. */
object SaProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val maxLen = 64
    val spark = SparkSession.builder()
      .appName("sa-probe2").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.ops.Dedup
    def full(d: String): Unit = {
      val docs = graft.Tables.documents(spark, d)
      val ranks = t(s"SA build") {
        Dedup.suffixArrayRanks(docs, "doc_id", "text", maxLen)
      }
      val sfx = docs.select(col("doc_id"),
          substring(col("text"), 1, maxLen).as("__t"))
        .where(length(col("__t")) > 0)
        .select(col("doc_id"),
          explode(expr("sequence(1, length(__t))")).as("p"), col("__t"))
        .select(col("doc_id"), col("p").cast("long").as("pos"),
          expr(s"substring(__t, p, $maxLen)").as("sfx"))
      val reps = t("reps join+dropDup+ckpt") {
        ranks.join(sfx, Seq("doc_id", "pos"))
          .select(col("suffix_rank").as("r"), col("sfx"))
          .dropDuplicates("r")
          .localCheckpoint()
      }
      t("reps count")(reps.count())
      val pairs = reps.select(col("r"), col("sfx").as("sa"))
        .join(reps.select((col("r") - 1).as("r"), col("sfx").as("sb")),
          Seq("r"))
        .withColumn("__b", Dedup.lcpFold("sa", "sb", maxLen))
        .withColumn("lcp",
          (col("__b") + Dedup.lcpWithin("sa", "sb", "__b")).cast("long"))
        .drop("__b")
      val lo = expr("""CASE WHEN lcp = 0 THEN 0 WHEN lcp < 4 THEN 1
        |WHEN lcp < 8 THEN 4 WHEN lcp < 16 THEN 8 WHEN lcp < 32 THEN 16
        |WHEN lcp < 64 THEN 32 ELSE 64 END""".stripMargin)
      t("pairs+lcp+dist") {
        pairs.withColumn("lcp_lo", lo)
          .groupBy("lcp_lo").agg(count(lit(1)).as("n_pairs")).count()
      }
      t("audit (max lcp)") {
        pairs.agg(max("lcp")).head()
      }
      t("audit (dup count)") {
        ranks.agg((count(lit(1)) -
          countDistinct("suffix_rank")).as("d")).head()
      }
    }
    full("/root/testdata/sf0.001") // warm
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    System.gc()
    println("[p2] === sf0.1 pass 1 ===")
    full(dir)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    System.gc()
    println("[p2] === sf0.1 pass 2 ===")
    full(dir)
    spark.stop()
  }
}
