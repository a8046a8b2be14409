package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Round-6k operators: interval overlap join and golden-record
  * survivorship. */
class Round6kSpec extends SparkSpec {
  import spark.implicits._

  test("intervalOverlapJoin matches brute force; half-open endpoints do not touch-overlap") {
    val a = Seq((1L, 10L, 1L, 5L), (1L, 11L, 20L, 120L), (2L, 12L, 0L, 3L))
      .toDF("k", "id_a", "s", "e")
    val b = Seq((1L, 20L, 5L, 9L),   // touches [1,5) at 5 -> NO overlap
      (1L, 21L, 4L, 6L),             // overlaps [1,5) by 1
      (1L, 22L, 100L, 200L),         // overlaps the 100-day interval
      (2L, 23L, 2L, 10L),            // overlaps [0,3) by 1
      (3L, 24L, 0L, 100L))           // different key -> never joins
      .toDF("k", "id_b", "s", "e")
    val got = Relational.intervalOverlapJoin(a, b, Seq("k"),
        "id_a", "id_b", "s", "e", cellSize = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == Map((1L, 10L, 21L) -> 1L, (1L, 11L, 22L) -> 20L,
      (2L, 12L, 23L) -> 1L))
  }

  test("intervalOverlapJoin emits each pair exactly once across many shared cells") {
    // both intervals span dozens of cells; without the overlap-start
    // cell ownership rule this pair would emit once per shared cell
    val a = Seq((1L, 1L, 0L, 1000L)).toDF("k", "id_a", "s", "e")
    val b = Seq((1L, 2L, 500L, 900L)).toDF("k", "id_b", "s", "e")
    val rows = Relational.intervalOverlapJoin(a, b, Seq("k"),
      "id_a", "id_b", "s", "e", cellSize = 10L).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(3) == 400L)
  }

  test("goldenRecord takes each field from the latest non-null member, ties by id") {
    val recs = Seq(
      (1L, 1L, 10L, Some("old@x"), None: Option[String]),
      (1L, 2L, 20L, None, Some("111")),      // latest email is NOT here
      (1L, 3L, 15L, Some("mid@x"), Some("222")),
      (2L, 4L, 5L, None, None),              // all-null cluster
      (3L, 5L, 7L, Some("a@x"), None),       // ts tie with id 6
      (3L, 6L, 7L, Some("b@x"), None))
      .toDF("cluster", "id", "ts", "email", "phone")
    val got = Relational.goldenRecord(recs, "cluster", "ts", "id",
        Seq("email", "phone"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), r.getLong(3)))).toMap
    // cluster 1: email from ts=15 (latest non-null), phone from ts=20 —
    // the golden record combines fields no single member carries
    assert(got(1L) == ((Some("mid@x"), Some("111"), 3L)))
    assert(got(2L) == ((None, None, 1L)))
    assert(got(3L) == ((Some("b@x"), None, 2L))) // ts tie -> higher id
  }
}
