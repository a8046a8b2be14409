package graft

import graft.ops.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 relational helpers: twoLevelCumSum is pinned bit-identical
  * to the naive global-order window it replaces, and mergeInto's
  * upsert/insert/delete/passthrough quadrants are each exercised.
  */
class RelationalExtSpec extends SparkSpec {
  import spark.implicits._

  test("twoLevelCumSum equals a global-order running sum (incl. negative keys)") {
    // keys straddle coarse-bucket boundaries and zero (floor-division
    // bucketing of negatives); counts vary to catch offset mistakes
    val hist = Seq((-23L, 5L), (-10L, 1L), (-1L, 7L), (0L, 2L), (3L, 4L),
      (9L, 1L), (10L, 9L), (11L, 2L), (25L, 3L), (99L, 8L), (100L, 1L))
      .toDF("c", "cnt")
    val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = hist.select(col("c"), sum("cnt").over(w).as("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Relational.twoLevelCumSum(hist, "c", "cnt", 10L)
      .select("c", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == naive)
  }

  test("twoLevelRowNumber equals a global row_number (incl. negative keys)") {
    // unique keys straddling bucket boundaries, zero, and negatives;
    // a sparse tail bucket catches offset arithmetic off-by-ones
    val df = Seq(-23L, -10L, -1L, 0L, 3L, 9L, 10L, 11L, 25L, 99L, 100L, 641L)
      .map(k => (k, s"v$k")).toDF("k", "tag")
    val naive = df.select(col("k"),
        row_number().over(Window.orderBy("k")).cast("long").as("seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Relational.twoLevelRowNumber(df, "k", 10L)
      .select("k", "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == naive)
    // original columns survive
    assert(Relational.twoLevelRowNumber(df, "k", 10L).columns.toSet ==
      Set("k", "tag", "seq"))
  }

  test("twoLevelRankDesc equals row_number over (score desc, id) with heavy ties") {
    // heavy score ties (the lexical-score shape that breaks
    // twoLevelRowNumber's distinct-key precondition), negative scores,
    // and ids straddling bucket boundaries
    val df = Seq(
      (1L, 0L), (2L, 0L), (3L, 5L), (4L, 0L), (9L, 0L), (10L, 5L),
      (11L, -2L), (12L, 0L), (25L, 7L), (26L, 7L), (99L, 0L), (100L, -2L))
      .toDF("id", "score")
    val naive = df.select(col("id"), row_number().over(
        Window.orderBy(col("score").desc, col("id"))).cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Relational.twoLevelRankDesc(df, "score", "id", 10L, "rk")
      .select("id", "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == naive)
    // original columns survive, temps dropped
    assert(Relational.twoLevelRankDesc(df, "score", "id", 10L, "rk")
      .columns.toSet == Set("id", "score", "rk"))
  }

  test("twoLevelRankDesc equals the naive window when scores are fully distinct") {
    // the OTHER degenerate end (every score unique — the dot-product
    // shape): the histogram term carries all the rank mass, id buckets
    // hold one row each, and ranks must still be bit-equal. Scores
    // straddle score-bucket boundaries and include negatives.
    val rnd = new scala.util.Random(23L)
    val df = (0L until 300L)
      .map(i => (i, rnd.nextInt(2000000).toLong - 1000000L)).distinct
      .toDF("id", "score")
    val naive = df.select(col("id"), row_number().over(
        Window.orderBy(col("score").desc, col("id"))).cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Relational.twoLevelRankDesc(df, "score", "id", 16L, "rk",
        scoreWidth = 1000L)
      .select("id", "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == naive)
  }

  test("twoLevelCumSum keeps the original columns") {
    val hist = Seq((1L, 2L, "x"), (7L, 3L, "y")).toDF("c", "cnt", "tag")
    val out = Relational.twoLevelCumSum(hist, "c", "cnt", 5L)
    assert(out.columns.toSet == Set("c", "cnt", "tag", "cum"))
  }

  test("mergeInto: upsert, insert, delete, passthrough") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    val source = Seq(
      (2L, "b2", 21L),   // matched upsert
      (4L, "d", 40L),    // unmatched insert
      (3L, "c", 0L))     // delete (v == 0 marks it below)
      .toDF("k", "name", "v")
    val out = Relational.mergeInto(base, source, "k",
        deleteWhen = col("v") === 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a", 10L), (2L, "b2", 21L), (4L, "d", 40L)))
  }

  test("mergeInto: delete of an absent key is a no-op") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val source = Seq((9L, "gone")).toDF("k", "name")
    val out = Relational.mergeInto(base, source, "k", deleteWhen = lit(true))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a")))
  }
}
