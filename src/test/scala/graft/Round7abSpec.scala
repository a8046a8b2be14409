package graft

import org.apache.spark.sql.functions._

/** Round-7ab pins: exact driver replays of the range-boundary
  * assignment and the Bloom filter, the Bloom FPR against its closed
  * form, and the Zipf octave structure. */
class Round7abSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q392 partition masses equal a driver boundary replay") {
    val keys = Tables.lineitem(spark, sf)
      .select((col("l_orderkey") * 1000000L + col("l_partkey")).as("k"))
      .collect().map(_.getLong(0))
    val sample = keys.filter(k => hashLong(s"$k#rb") % 64 == 0).sorted
    val ns = sample.length.toLong
    val bounds = (1 to 31).map(i => sample(((i * ns) / 32 - 1).toInt))
    val want = keys.groupBy(k => bounds.count(_ < k).toLong)
      .map { case (p, v) => p -> v.length.toLong }
    val got = graft.queries.Registry.byName("q392_range_boundaries")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.sum == keys.length.toLong) // nothing dropped
  }

  test("property: q393 Bloom filter equals a driver replay and matches theory") {
    val ins = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val words = new Array[Long](2048)
    ins.foreach { key =>
      (0 until 4).foreach { j =>
        val h = hashLong(s"$key#b$j") % 65536
        words(h.toInt / 32) |= 1L << (h % 32)
      }
    }
    val fps = ins.count { k0 =>
      val key = k0 + 1000000000L
      (0 until 4).forall { j =>
        val h = hashLong(s"$key#b$j") % 65536
        (words(h.toInt / 32) >> (h % 32) & 1L) == 1L
      }
    }
    val r = graft.queries.Registry.byName("q393_bloom_fpr_eval")
      .fn(spark, sf).collect().head
    assert(r.getLong(0) == ins.length.toLong)
    assert(r.getLong(3) == ins.length.toLong)
    assert(r.getLong(4) == fps.toLong, s"fp ${r.getLong(4)} vs $fps")
    // closed form (1 − e^{−kn/m})^k as an expected COUNT with
    // Poisson-scale slack (tiny at small sf, tight at sf0.1)
    val p = math.pow(1 - math.exp(-4.0 * ins.length / 65536.0), 4)
    val expected = p * ins.length
    assert(math.abs(fps - expected) <= 4 + 0.25 * expected,
      s"measured $fps vs theoretical $expected")
  }

  test("property: q394 Zipf octaves equal a driver vocabulary replay") {
    val toks = Tables.documents(spark, sf)
      .select(graft.ops.Text.tokens(col("text")).as("t"))
      .collect().flatMap(_.getSeq[String](0))
    val vocab = toks.groupBy(identity).map { case (_, v) => v.length.toLong }
    val n = vocab.sum
    val want = vocab.groupBy(c => 63 - java.lang.Long.numberOfLeadingZeros(c))
      .map { case (o, cs) =>
        o.toLong -> ((cs.size.toLong, cs.sum, cs.sum * 1000000L / n)) }
    val got = graft.queries.Registry.byName("q394_zipf_octaves")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want && got.nonEmpty)
    // structural: octave o only holds counts in [2^o, 2^{o+1})
    got.keys.foreach(o => assert(o >= 0 && o < 63))
  }
}
