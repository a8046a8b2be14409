package graft

import graft.ops.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 pins: the tar walk as a native expression (the r8
  * wavMetadata/patchStats discipline extended — no ScalaUDF, no
  * encoder round trip, same values as the fuzzed byte walker).
  */
class Round12Spec extends SparkSpec {

  test("tarWalk is a native expression: no ScalaUDF, same values, offsets slice") {
    val tar = Multimodal.makeTar(Seq(
      ("a.txt", "hello world".getBytes("US-ASCII")),
      ("a.cls", Array[Byte](7)),
      ("a.bin", Array.tabulate[Byte](600)(_.toByte))))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("shard", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, tar),
        Row(2L, tar.take(600)), // truncated mid-entry
        Row(3L, Array.fill[Byte](1024)(42))), 2), schema) // bad magic
    val out = df.select(col("id"), Multimodal.tarWalk(col("shard")).as("w"),
      col("shard"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("graft_tar_walk"), plan)
    // same verdicts as the fuzzed byte walker, per row
    val got = out.select(col("id"), col("w.valid"), col("w.err"),
        col("w.n_entries")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, true, "", 3L), (2L, false, "truncated", 1L),
      (3L, false, "bad_magic", 0L)), got.toString)
    // the offsets' point: payload extraction is a builtin binary slice
    val payload = out.where(col("w.valid"))
      .select(explode(col("w.entries")).as("e"), col("shard"))
      .where(col("e.name") === "a.txt")
      .select(expr("substring(shard, e.offset + 1, e.size)").as("p"))
      .head.getAs[Array[Byte]](0)
    assert(new String(payload, "US-ASCII") == "hello world")
  }

  test("sample assembly over mutated shards quarantines, never fails a task") {
    // the q585 pipeline end to end — walk, offset slice, extension
    // route, group, completeness gate — over 90 byte-mutated shards:
    // the corrupt-record posture must hold through the WHOLE assembly,
    // not just the walk (a poisoned payload reaching wavMetadata or
    // the cls int cast must degrade to a quarantined/invalid sample)
    val base = Multimodal.makeTar(Seq(
      ("7a.txt", "doc 7 sample a".getBytes("UTF-8")),
      ("7a.cls", Array[Byte]('3'.toByte)),
      ("7a.wav", Multimodal.makeWav(8000, 1, new Array[Short](25)))))
    val rnd = new scala.util.Random(7)
    val mutants = Seq(base) ++ (1 to 90).map { i =>
      val m = base.clone()
      i % 3 match {
        case 0 => m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte; m
        case 1 => m.take(rnd.nextInt(m.length))
        case _ => (1 to 5).foreach(_ =>
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte); m
      }
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("b", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        mutants.zipWithIndex.map { case (m, i) => Row(i.toLong, m) }, 4),
      schema)
    val walked = df.withColumn("w", Multimodal.tarWalk(col("b")))
    val entries = walked.where(col("w.valid"))
      .select(col("doc_id"), col("b"), explode(col("w.entries")).as("e"))
      .select(col("doc_id"),
        expr("substring_index(e.name, '.', 1)").as("k"),
        expr("substring_index(e.name, '.', -1)").as("ext"),
        expr("substring(b, e.offset + 1, e.size)").as("payload"))
    val samples = entries.groupBy("doc_id", "k").agg(
      first(when(col("ext") === "txt", col("payload")), ignoreNulls = true)
        .as("txt"),
      first(when(col("ext") === "cls", col("payload")), ignoreNulls = true)
        .as("cls"),
      first(when(col("ext") === "wav", col("payload")), ignoreNulls = true)
        .as("wav"))
    val out = samples
      .withColumn("complete", col("txt").isNotNull &&
        col("cls").isNotNull && col("wav").isNotNull)
      .withColumn("wm", Multimodal.wavMetadata(col("wav")))
      .withColumn("label", col("cls").cast("string").cast("int"))
      .select("doc_id", "complete", "label")
      .collect() // must not throw, whatever the mutation did
    // the unmutated shard (doc 0) must assemble cleanly
    val clean = out.find(_.getLong(0) == 0L).get
    assert(clean.getBoolean(1) && clean.getInt(2) == 3)
  }
}
