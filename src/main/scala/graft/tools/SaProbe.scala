package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for suffixArrayRanks (optimization round
  * instrumentation — replicates the op's CURRENT stages with timers).
  */
object SaProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val maxLen = 64
    val spark = SparkSession.builder()
      .appName("sa-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    graft.ops.Dedup.suffixArrayRanks(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", maxLen).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[saprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val df = graft.Tables.documents(spark, dir)
    val tt = df.select(col("doc_id"),
      substring(col("text"), 1, maxLen).as("__t"))
      .where(length(col("__t")) > 0)
      .withColumn("__t", when(col("__t").rlike("[^\\x00-\\x7F]"),
        raise_error(lit("non-ascii")).cast("string"))
        .otherwise(col("__t")))
    val baseKey = (0 until 8).map(i =>
        ascii(expr(s"substring(__t, pos + $i, 1)")).cast("long") *
          (1L << (8 * (7 - i))))
      .reduce(_ + _)
    val based = t("base frame ckpt") {
      tt.select(col("doc_id"), col("__t"),
          explode(expr("sequence(1, length(__t))")).as("pos"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          baseKey.as("__key"))
        .localCheckpoint()
    }
    var ranks = t("base dense rank + ckpt") {
      graft.ops.Dedup.twoLevelDenseRank(based, "__key", "r", 1L << 44)
        .select("doc_id", "pos", "r").localCheckpoint()
    }
    graft.ops.Checkpoints.free(based)
    var h = 8L
    while (h < maxLen) {
      val hh = h
      val old = ranks
      val nRanks = t(s"h=$hh nRanks head") {
        ranks.agg(max(col("r"))).head.getLong(0)
      }
      val quad = nRanks <= 55107L
      val w = nRanks + 1L
      println(s"[saprobe] h=$hh nRanks=$nRanks quad=$quad")
      def shift(k: Long, as: String) = ranks.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("r").as(as))
      ranks = (if (quad) {
        val paired = ranks
          .join(shift(hh, "__r2"), Seq("doc_id", "pos"), "left")
          .join(shift(2 * hh, "__r3"), Seq("doc_id", "pos"), "left")
          .join(shift(3 * hh, "__r4"), Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"),
            (((col("r") * w + coalesce(col("__r2"), lit(0L))) * w
              + coalesce(col("__r3"), lit(0L))) * w
              + coalesce(col("__r4"), lit(0L))).as("__key"))
        val coarse = math.max(1L, w * w * w * w / 2048L)
        t(s"h=$hh QUAD dense rank + ckpt") {
          graft.ops.Dedup.twoLevelDenseRank(paired, "__key", "__nr", coarse)
            .select(col("doc_id"), col("pos"), col("__nr").as("r"))
            .localCheckpoint()
        }
      } else {
        val paired = ranks
          .join(shift(hh, "__r2"), Seq("doc_id", "pos"), "left")
          .withColumn("__r2", coalesce(col("__r2"), lit(0L)))
        val coarse = math.max(1L, nRanks * (nRanks + 2L) / 2048L)
        t(s"h=$hh PAIR dense rank + ckpt") {
          graft.ops.Dedup.twoLevelDenseRank(
            paired.withColumn("__key", col("r") * w + col("__r2")),
            "__key", "__nr", coarse)
            .select(col("doc_id"), col("pos"), col("__nr").as("r"))
            .localCheckpoint()
        }
      })
      graft.ops.Checkpoints.free(old)
      h *= (if (quad) 4 else 2)
    }
    t("final count")(ranks.count())
    spark.stop()
  }
}
