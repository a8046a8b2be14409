package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Text

/** Scratch timing probe: why is the inline wordShingles explode 12 s
  * in q430 but 0.15 s in q380 (same shape)? A/B across barrier /
  * posexplode / n / extra-column variants.
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("kmv-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kmv] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(2000)
      .selectExpr("cast(id as string) s")
      .select(explode(graft.ops.Dedup.wordShingles(
        Text.tokens(concat(col("s"), lit(" a b c d e"))), 3)).as("w"))
      .select(md5(col("w"))).count()

    val docs = graft.Tables.documents(spark, dir)
    docs.count()

    // q430 inline shape
    val inline3 = docs.select(col("source"),
      explode(graft.ops.Dedup.wordShingles(Text.tokens(col("text")), 3)).as("tok"))
    t("inline n=3 explode")(inline3.count())

    // q380 shape: separate val base, posexplode, n=8
    val base = docs.select(col("doc_id"), col("source"),
      Text.tokens(col("text")).as("t"))
    val q380sh = base.select(col("doc_id"),
      posexplode(graft.ops.Dedup.wordShingles(col("t"), 8)).as(Seq("p", "sgl")))
    t("q380-style posexplode n=8")(q380sh.count())

    // q380 shape but explode + n=3
    val v2 = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(graft.ops.Dedup.wordShingles(col("t"), 3)).as("sgl"))
    t("two-project explode n=3")(v2.count())

    // inline but posexplode n=3
    val v3 = docs.select(col("source"),
      posexplode(graft.ops.Dedup.wordShingles(Text.tokens(col("text")), 3))
        .as(Seq("p", "tok")))
    t("inline posexplode n=3")(v3.count())

    spark.stop()
  }
}
