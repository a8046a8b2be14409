package graft

import graft.ops.{Dedup, Relational}
import org.apache.spark.sql.functions._

/** Round-6h operators: content-defined chunking and snapshot diff. */
class Round6hSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Dedup.cdcChunkShares(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("cdcChunkShares: identical twins share every chunk, disjoint docs share none") {
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"other$i").mkString(" ")
    val got = chunks(Seq((1L, body), (2L, body), (3L, other)))
    val (n1, s1, ppm1) = got(1L)
    assert(n1 >= 1 && s1 == n1 && ppm1 == 1000000L)
    assert(got(2L) == got(1L))
    val (_, s3, ppm3) = got(3L)
    assert(s3 == 0L && ppm3 == 0L)
  }

  test("cdcChunkShares: a front insertion only disturbs the prefix (shift-robust, unlike a fixed grid)") {
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted " + body
    val got = chunks(Seq((1L, body), (2L, shifted)))
    val (n1, s1, _) = got(1L)
    val (n2, s2, _) = got(2L)
    // every chunk after the first boundary is byte-identical in both
    // docs: at most the leading chunk differs on each side
    assert(n1 >= 2, s"need a boundary hit in the fixture, got $n1 chunk(s)")
    assert(s1 >= n1 - 1, s"doc1 shares $s1 of $n1")
    assert(s2 >= n2 - 1, s"doc2 shares $s2 of $n2")
  }

  test("cdcChunkShares: empty and token-free docs survive with zero chunks") {
    val got = chunks(Seq((1L, ""), (2L, "...!!!"), (3L, "alpha beta")))
    assert(got(1L) == ((0L, 0L, 0L)))
    assert(got(2L) == ((0L, 0L, 0L)))
    assert(got(3L)._1 >= 1L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged off fingerprints") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "fp")
    val v2 = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "fp")
    val got = Relational.snapshotDiff(v1, v2, "k", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }
}
