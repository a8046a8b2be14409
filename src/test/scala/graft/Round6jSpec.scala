package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-6j: winnowing fingerprint selection vs an in-test reference
  * implementation, plus the MOSS detection guarantee. */
class Round6jSpec extends SparkSpec {
  import spark.implicits._

  private val N = 4; private val W = 4

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Reference winnowing: per full window of W shingle hashes select
    * (min hash, rightmost tied position); the doc's set is the
    * distinct selections. */
  private def refWinnow(words: Seq[String]): Set[(Long, Int)] = {
    val hashes = words.sliding(N).map(sh => md5Long(sh.mkString(" "))).toVector
    (0 to hashes.length - W).map { p =>
      val win = (p until p + W).map(i => (hashes(i), i))
      val mn = win.map(_._1).min
      win.filter(_._1 == mn).maxBy(_._2)
    }.toSet
  }

  test("winnowedFingerprints matches the reference selection counts") {
    // deterministic word soup with a repeated phrase so ties and
    // cross-window re-selections occur
    val words = (0 until 50).map(i => s"w${(i * 7) % 13}")
    val doc = words.mkString(" ")
    val got = Dedup.winnowedFingerprints(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", N, W)
      .collect().head
    val ref = refWinnow(words)
    assert(got.getLong(1) == words.length - N + 1)          // n_shingles
    assert(got.getLong(2) == words.length - N + 1 - (W - 1)) // n_windows
    assert(got.getLong(3) == ref.size.toLong, s"selected ${got.getLong(3)} vs ref ${ref.size}")
  }

  test("winnowing guarantee: a shared run of >= W+N-1 tokens shares a selected fingerprint") {
    val shared = (0 until 10).map(i => s"common$i")
    val a = ((0 until 20).map(i => s"lefta$i") ++ shared ++
      (0 until 20).map(i => s"leftb$i")).mkString(" ")
    val b = ((0 until 20).map(i => s"rghta$i") ++ shared ++
      (0 until 20).map(i => s"rghtb$i")).mkString(" ")
    val got = Dedup.winnowedFingerprints(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", N, W)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got(1L) >= 1L, "doc 1 shares no selected fingerprint")
    assert(got(2L) >= 1L, "doc 2 shares no selected fingerprint")
  }

  test("winnowing: docs shorter than one window select nothing but survive") {
    val got = Dedup.winnowedFingerprints(
        Seq((1L, "a b c d e"), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text", N, W)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 5 tokens -> 2 shingles -> 0 full windows of 4
    assert(got(1L) == ((2L, 0L, 0L)))
    assert(got(2L) == ((0L, 0L, 0L)))
  }
}
