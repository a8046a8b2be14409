package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 connector: planning surface (partitions, pruning) and
  * end-to-end integration with the normalization pipeline. */
class SourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def read(ids: Seq[String], parts: Int = 2) =
    spark.read.format("graft-stub-transcripts")
      .option("ids", ids.mkString(","))
      .option("numPartitions", parts.toString)
      .load()

  test("short-name registration + schema + deterministic rows") {
    val df = read(Seq("vidA", "vidB"))
    assert(df.schema == graft.model.Schema.rawTranscript)
    val rows = df.as[(String, Double, Double, String)].collect().sortBy(r => (r._1, r._2))
    assert(rows.length == 4)
    assert(rows.head == ("vidA", 0.0, 1.5, "hello from vidA."))
  }

  test("ids split across the requested number of input partitions") {
    val df = read(Seq("a", "b", "c", "d", "e"), parts = 3)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 10)
  }

  test("column pruning reaches the reader (plan shows pruned ReadSchema)") {
    val df = read(Seq("vidA")).select("video_id")
    val plan = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output columns inline
    assert(plan.contains("BatchScan graft_stub_transcripts[video_id#"), plan)
    assert(!plan.contains("text#"), plan)
    assert(df.as[String].collect().toSet == Set("vidA"))
  }

  test("source feeds the T5/T6 normalization pipeline end to end") {
    val recs = graft.ingest.Normalize.segmentsFromRaw(read(Seq("vidZ")))
      .select(col("video_id"),
        graft.ingest.Normalize.flattenSegments(col("segments")).as("text"))
      .as[(String, String)].head()
    assert(recs == ("vidZ", "hello from vidZ.\nsecond segment of vidZ!"))
  }
}
