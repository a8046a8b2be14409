package graft

import graft.model.{IngestRecord, Schema, Segment}
import graft.ops.{Multimodal, Relational}
import org.apache.spark.sql.functions._

/** Sink-format round trips + binary sink + salted skew join. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    IngestRecord("r1", Schema.SourceYoutubeTranscript, Some("xin chào thế giới"),
      Some(Seq(Segment(0.0, 1.5, "xin chào"), Segment(1.5, 1.0, "thế giới"))),
      None, Map("video_id" -> "dQw4w9WgXcQ")),
    IngestRecord("r2", Schema.SourceSystemAudio, None, None,
      Some("out/a.wav"), Map("engine" -> "vosk")))

  test("parquet / json / orc sinks round-trip the nested record; csv the flat view") {
    val root = java.nio.file.Files.createTempDirectory("sinks")
    val ds = recs.toDS()
    for (fmt <- Seq("parquet", "json", "orc")) {
      val dir = root.resolve(fmt).toString
      ds.write.format(fmt).mode("overwrite").save(dir)
      val back = (fmt match {
        case "json" => spark.read.schema(Schema.ingest).format(fmt).load(dir)
        case _ => spark.read.format(fmt).load(dir)
      }).as[IngestRecord].collect().sortBy(_.id).toSeq
      assert(back == recs, s"format $fmt")
    }
    // CSV cannot nest: flat projection round-trips
    val csvDir = root.resolve("csv").toString
    val flat = ds.select(col("id"), col("source_type"), col("text"), col("binary_path"))
    flat.write.option("header", "true").mode("overwrite").csv(csvDir)
    val backCsv = spark.read.option("header", "true").csv(csvDir)
      .orderBy("id").collect()
    assert(backCsv.length == 2 && backCsv(0).getString(0) == "r1")
  }

  test("writeBinaryFiles (K3) emits one file per row; binaryFile scan reads them back") {
    val dir = java.nio.file.Files.createTempDirectory("binsink").toString
    val wavA = Multimodal.makeWav(16000, 1, Array.fill[Short](160)(3))
    val wavB = Multimodal.makeWav(8000, 1, Array.fill[Short](80)(4))
    val df = Seq(("aud_1", wavA), ("aud_2", wavB)).toDF("id", "content")
    Multimodal.writeBinaryFiles(df, "id", "content", dir)
    val back = Multimodal.readBinaryDir(spark, dir)
      .withColumn("meta", Multimodal.wavMetadata(col("content")))
      .select(regexp_extract(col("path"), "([^/]+)\\.wav$", 1),
        col("meta.sample_rate"))
      .as[(String, Int)].collect().toMap
    assert(back == Map("aud_1" -> 16000, "aud_2" -> 8000))
  }

  test("partitioned writes prune: only the filtered partition's files are scanned") {
    val dir = java.nio.file.Files.createTempDirectory("partby").toString
    val orders = Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
    orders.write.partitionBy("order_year").mode("overwrite").parquet(dir)
    val filtered = spark.read.parquet(dir).where(col("order_year") === 1997)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    // the year filter must be a PARTITION filter (directory pruning at
    // listing time), not a data filter evaluated per row
    assert(plan.contains("PartitionFilters: [isnotnull(order_year") ||
      plan.contains("PartitionFilters: [(order_year"), plan)
    val expected = orders.where(col("order_year") === 1997).count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("compactParquet shrinks a many-file table to the byte-sized count") {
    import graft.ops.Layout
    val in = java.nio.file.Files.createTempDirectory("compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("compact-out").toString + "/t"
    spark.range(10000).selectExpr("id", "id % 7 AS k")
      .repartition(16).write.mode("overwrite").parquet(in)
    val filesBefore = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(filesBefore == 16)
    // target larger than the whole table -> exactly one output file
    val n = Layout.compactParquet(spark, in, out, targetBytes = 1L << 30)
    assert(n == 1)
    val filesAfter = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(filesAfter == 1)
    // content identical
    assert(spark.read.parquet(out).orderBy("id").collect().toSeq ==
      spark.read.parquet(in).orderBy("id").collect().toSeq)
  }

  test("writeClustered: directory pruning + in-file ordering by sort key") {
    import graft.ops.Layout
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString + "/t"
    val df = spark.range(1000).selectExpr("id", "CAST(id % 4 AS STRING) AS part",
      "id * 37 % 1000 AS v")
    Layout.writeClustered(df, dir, "part", Seq("v"))
    // directory-level pruning visible in the scan
    val scanned = spark.read.parquet(dir).where(col("part") === "2")
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
    // rows inside each file arrive sorted by v (row-group stats monotone)
    val rows = spark.read.parquet(dir).where(col("part") === "2")
      .select("v").as[Long].collect()
    assert(rows.toSeq == rows.sorted.toSeq)
    assert(scanned.count() == 250)
  }

  test("saltedJoin equals the direct join (skew spread over salt buckets)") {
    val big = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val small = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val direct = big.join(small, Seq("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Relational.saltedJoin(big, small, "l_orderkey", 4, col("l_quantity"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
