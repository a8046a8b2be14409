package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Pins [[Dedup.suffixArrayRanks]] against a brute-force suffix sort
  * computed in plain Scala — the oracle lane (q581) proves engine
  * agreement at corpus size; this spec proves the ALGORITHM on inputs
  * chosen to hit the doubling recursion's edges: repeated substrings
  * (rank ties deep into the rounds), one doc a prefix of another
  * (the sentinel path), single-char docs, and cross-doc exact
  * duplicate tails (the dedup signal: shared ranks).
  */
class SuffixArraySpec extends SparkSpec {

  private def brute(docs: Seq[(Long, String)], maxLen: Int)
      : Map[(Long, Long), Long] = {
    val sfx = for {
      (id, text) <- docs
      t = text.take(maxLen)
      p <- 1 to t.length
    } yield ((id, p.toLong), t.substring(p - 1))
    val order = sfx.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    sfx.map { case (k, s) => k -> order(s) }.toMap
  }

  private def run(docs: Seq[(Long, String)], maxLen: Int): Unit = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val got = Dedup.suffixArrayRanks(df, "doc_id", "text", maxLen)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val want = brute(docs, maxLen)
    assert(got == want,
      s"ranks diverge:\n got=${got.toSeq.sorted}\nwant=${want.toSeq.sorted}")
  }

  test("repeated substrings: ties must persist exactly as long as the text does") {
    run(Seq(1L -> "abababab", 2L -> "babababa"), 16)
  }

  test("prefix docs: the sentinel orders the shorter suffix first") {
    run(Seq(1L -> "abcabc", 2L -> "abc", 3L -> "ab"), 8)
  }

  test("cross-doc duplicate tails share ranks (the dedup signal)") {
    val docs = Seq(1L -> "xxhello world", 2L -> "yyhello world",
      3L -> "zzgoodbye")
    run(docs, 16)
    // the shared tail "hello world" (and every suffix of it) must
    // collide: docs 1 and 2 share exactly those 11 suffix ranks
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val ranks = Dedup.suffixArrayRanks(df, "doc_id", "text", 16)
    val shared = ranks.groupBy("suffix_rank")
      .agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") > 1).count()
    assert(shared == 11L, s"expected 11 shared-tail ranks, got $shared")
  }

  test("single chars and the round boundary (maxLen not a power of two)") {
    run(Seq(1L -> "a", 2L -> "b", 3L -> "ba"), 3)
    run(Seq(1L -> "mississippi", 2L -> "missing"), 11)
  }

  test("composite pair rank == exact-width packed rank (the >3e9 path)") {
    // the representation switch must be invisible: forceComposite
    // replays every doubling round through compositeDenseRank (the
    // unbounded two-column path a >3-billion-rank round takes) and
    // must reproduce the packed path's ranks bit for bit
    val docs = Seq(1L -> "abracadabra alakazam", 2L -> "abracadabra!",
      3L -> "cadabra cadabra", 4L -> "zz")
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val packed = Dedup.suffixArrayRanks(df, "doc_id", "text", 32)
      .orderBy("doc_id", "pos").collect().toSeq
    val composite = Dedup
      .suffixArrayRanks(df, "doc_id", "text", 32, forceComposite = true)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(packed == composite,
      s"representation switch changed ranks:\n$packed\nvs\n$composite")
    // and the composite path is still the BRUTE-correct answer
    val got = composite.map(r => ((r.getLong(0), r.getLong(1)),
      r.getLong(2))).toMap
    assert(got == brute(docs, 32))
  }

  test("rank-quadrupling round == pure doubling (the r12 arity switch)") {
    // at 64-char cap the r12 build takes ONE quad round (8→32) plus a
    // pair round (32→64) when the base rank count allows; the
    // forceComposite path still doubles every round — their ranks
    // must agree bit for bit, and both must be brute-correct, on a
    // corpus with repeats deep enough to split classes in EVERY round
    val long1 = ("abcdefgh" * 8).take(64)
    val long2 = ("abcdefgh" * 4) + ("abcdefgx" * 4)
    val long3 = ("abcdefgh" * 7) + "abcdefgZ"
    val docs = Seq(1L -> long1, 2L -> long2, 3L -> long3,
      4L -> long1.drop(3), 5L -> "short")
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val quadPath = Dedup.suffixArrayRanks(df, "doc_id", "text", 64)
      .orderBy("doc_id", "pos").collect().toSeq
    val doubling = Dedup
      .suffixArrayRanks(df, "doc_id", "text", 64, forceComposite = true)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(quadPath == doubling,
      s"quad round changed ranks:\n$quadPath\nvs\n$doubling")
    val got = quadPath.map(r => ((r.getLong(0), r.getLong(1)),
      r.getLong(2))).toMap
    assert(got == brute(docs, 64))
  }

  test("two-level LCP fold == flat char-wise fold (the r12 block fold)") {
    import org.apache.spark.sql.Row
    val cases = Seq(
      ("", ""), ("a", ""), ("a", "a"), ("ab", "ac"),
      ("abcdefgh", "abcdefgh"),           // exactly one full block
      ("abcdefghi", "abcdefghj"),         // full block + unequal char
      ("abcdefgh" * 8, "abcdefgh" * 8),   // all 64 equal
      (("abcdefgh" * 8).take(63), "abcdefgh" * 8), // prefix of other
      ("abcdefgh" * 4 + "X" + "abcdefgh" * 3,
        "abcdefgh" * 8),                  // mismatch mid-block 4
      ("xbcdefgh", "ybcdefgh"))           // mismatch at char 1
    val df = spark.createDataFrame(cases).toDF("sa", "sb")
    val flat = expr("""aggregate(sequence(1, 64), 0,
      |(acc, k) -> CASE WHEN acc = k - 1
      |  AND substring(sa, k, 1) != ''
      |  AND substring(sa, k, 1) = substring(sb, k, 1)
      |THEN k ELSE acc END)""".stripMargin)
    val rows = df
      .withColumn("__b", Dedup.lcpFold("sa", "sb", 64))
      .withColumn("two", col("__b") + Dedup.lcpWithin("sa", "sb", "__b"))
      .withColumn("flat", flat)
      .select("sa", "two", "flat").collect()
    rows.foreach { case Row(sa: String, two: Int, flat: Int) =>
      assert(two == flat, s"LCP folds diverge on '$sa': $two vs $flat")
    }
  }

  test("non-ASCII input fails loudly, never mis-ranks (single-byte gate)") {
    // a codepoint past 127 would overflow its lane in the 8-char base
    // fold and silently corrupt every rank above it — the fold must
    // raise the named error instead
    val df = spark.createDataFrame(Seq(1L -> "plain", 2L -> "café au lait"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.suffixArrayRanks(df, "doc_id", "text", 16).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("single-byte only")),
      s"expected the named non-ASCII error, got: ${messages(e)}")
  }
}
