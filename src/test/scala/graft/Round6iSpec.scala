package graft

import graft.ops.Relational
import graft.streaming.Sessions
import org.apache.spark.sql.functions._

/** Round-6i operators: grid-bucketed spatial join and the streaming
  * changelog fold. */
class Round6iSpec extends SparkSpec {
  import spark.implicits._

  // ---- Relational.gridDistanceJoin ---------------------------------

  test("gridDistanceJoin matches brute force, including boundary-exact and cross-cell pairs") {
    // deterministic LCG point cloud + two handcrafted cases:
    // ids 900/901 straddle a cell boundary 9 apart (cells differ),
    // ids 902/903 sit exactly radius apart (dist2 == r²  kept)
    val cloud = (0 until 80).map { i =>
      (i.toLong, ((i * 1103515245L + 12345) % 200).abs, ((i * 69069L + 7) % 200).abs)
    }
    val pts = (cloud ++ Seq((900L, 98L, 50L), (901L, 103L, 50L),
      (902L, 150L, 0L), (903L, 150L, 10L))).toDF("id", "x", "y")
    val got = Relational.gridDistanceJoin(pts, "id", "x", "y", radius = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val all = (cloud ++ Seq((900L, 98L, 50L), (901L, 103L, 50L),
      (902L, 150L, 0L), (903L, 150L, 10L)))
    val expected = (for {
      (ia, xa, ya) <- all; (ib, xb, yb) <- all if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= 100
    } yield (ia, ib) -> d2).toMap
    assert(got == expected)
    assert(got((900L, 901L)) == 25L)
    assert(got((902L, 903L)) == 100L)
  }

  // ---- Sessions.streamingChangelogApply ----------------------------

  test("streamingChangelogApply merges across micro-batches like the batch argmax fold") {
    val root = java.nio.file.Files.createTempDirectory("cdc")
    val in = root.resolve("in"); java.nio.file.Files.createDirectories(in)
    val work = root.resolve("work").toString

    def drop(name: String, rows: Seq[(Long, Long, Long, Boolean, Long)]): Unit = {
      val tmp = root.resolve(name + ".tmp")
      rows.toDF("k", "ts_us", "eid", "is_delete", "v")
        .coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part), in.resolve(name))
    }

    // three files -> three micro-batches (maxFilesPerTrigger = 1):
    //  key 1: upsert v=10, then newer upsert v=11 in a LATER batch
    //  key 2: upsert, then a newer delete in a later batch -> gone
    //  key 3: newest row arrives in the MIDDLE batch; the last batch
    //         carries an older ts that must NOT win
    //  key 4: only a delete -> never surfaces
    drop("b1.parquet", Seq((1L, 100L, 1L, false, 10L), (2L, 100L, 2L, false, 20L)))
    drop("b2.parquet", Seq((1L, 200L, 3L, false, 11L), (3L, 200L, 4L, false, 30L),
      (2L, 300L, 5L, true, 0L)))
    drop("b3.parquet", Seq((3L, 100L, 6L, false, 99L), (4L, 100L, 7L, true, 0L)))

    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts_us BIGINT, eid BIGINT, is_delete BOOLEAN, v BIGINT")
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(in.toString)
    val got = Sessions.streamingChangelogApply(stream, "k",
        Seq("ts_us", "eid"), "is_delete", work)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 11L, 3L -> 30L))

    // the run really went through multiple versioned merges
    val versions = new java.io.File(work).list().count(_.startsWith("v"))
    assert(versions >= 2, s"expected multi-batch versions, got $versions")
  }
}
