package graft

import org.apache.spark.sql.functions._

/** Round-7l pins: priority sampling, Boolean retrieval, and surprisal
  * against driver brute forces; the consistent-hash monotonicity
  * theorem (adding a shard only moves keys INTO it). */
class Round7lSpec extends SparkSpec {

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)

  test("property: q333 priority sample equals a driver brute force") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = docs.map { case (id, w) =>
      (id, w, w * 4294967296L / (hash32(s"$id#pri") + 1))
    }.sortBy { case (id, _, p) => (-p, id) }.take(100).toSeq
    val got = graft.queries.Registry.byName("q333_priority_sampling")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("q334 consistent hashing: conservation + moves only INTO the new shard") {
    val rows = graft.queries.Registry.byName("q334_consistent_hash_ring")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == total, "before counts conserve keys")
    assert(rows.map(_._3).sum == total, "after counts conserve keys")
    // THE consistent-hashing theorem: existing vnode positions are
    // unchanged, so a key moves only when an n5 vnode lands between
    // it and its old successor — every move lands in n5
    rows.foreach { case (shard, _, nAfter, movedIn) =>
      if (shard == "n5") assert(movedIn == nAfter,
        "every key in the new shard must have moved in")
      else assert(movedIn == 0L,
        s"$shard gained $movedIn keys — old shards can only lose")
    }
    // moved mass ≈ vnode share 32/192 = 1/6 of keys (loose band)
    val moved = rows.find(_._1 == "n5").map(_._4).getOrElse(0L)
    assert(moved * 100 >= total * 5 && moved * 100 <= total * 35,
      s"moved $moved of $total outside the ≈1/6 band")
  }

  test("property: q335 Boolean retrieval equals a driver brute force") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ops.Text.tokens(col("text")))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val want = docs.collect {
      case (id, toks)
        if toks.contains("join") && toks.contains("hash") &&
          !toks.contains("slow") =>
        (id, toks.count(_ == "join").toLong, toks.count(_ == "hash").toLong)
    }.sortBy(_._1).toSeq
    val got = graft.queries.Registry.byName("q335_boolean_retrieval")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("q337 streaming surprisal == q336 batch surprisal, row for row") {
    val batch = graft.queries.Registry.byName("q336_surprisal_score")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val stream = graft.queries.Registry.byName("q337_streaming_surprisal")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("property: q336 surprisal equals a driver brute force") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ops.Text.tokens(col("text")))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val vocab = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val n = vocab.values.sum
    val want = docs.filter(_._2.nonEmpty).map { case (id, toks) =>
      val bits = toks.map(t => 63 - java.lang.Long
        .numberOfLeadingZeros(n / vocab(t))).map(_.toLong).sum
      (id, toks.length.toLong, bits, bits * 1000 / toks.length)
    }.sortBy(_._1).toSeq
    val got = graft.queries.Registry.byName("q336_surprisal_score")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got.nonEmpty && got == want)
  }
}
