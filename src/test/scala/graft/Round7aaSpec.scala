package graft

import org.apache.spark.sql.functions._

/** Round-7aa pins: the expectation ledger passes on clean data and
  * catches planted violations, the padding-waste policy ordering law,
  * and an exact driver replay of the paired bootstrap. */
class Round7aaSpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("law: q389 all expectations pass on generator data; counts are full-table") {
    val rows = graft.queries.Registry.byName("q389_expectation_suite")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 6)
    rows.foreach { case (c, checked, viol, pass) =>
      assert(checked > 0, s"$c checked nothing")
      assert(pass == (viol == 0L), s"$c pass/violation mismatch")
      assert(viol == 0L, s"$c unexpectedly dirty: $viol")
    }
  }

  test("law: q390 sorted <= bucketed <= arrival waste; padded >= tokens") {
    val rows = graft.queries.Registry.byName("q390_padding_waste")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set("1_arrival", "2_bucketed", "3_sorted"))
    rows.values.foreach { case (nb, tok, pad, ppm) =>
      assert(nb > 0 && pad >= tok)
      assert(ppm == (pad - tok) * 1000000L / pad)
    }
    // every policy packs the same tokens
    assert(rows.values.map(_._2).toSet.size == 1)
    // sorting can only help; bucketing sits between (ties allowed)
    assert(rows("3_sorted")._4 <= rows("2_bucketed")._4)
    assert(rows("2_bucketed")._4 <= rows("1_arrival")._4 ||
      // bucketed pays for ragged per-bucket tail batches; allow a
      // small crossover but never a blowout
      rows("2_bucketed")._4 <= rows("1_arrival")._4 + 100000)
  }

  test("property: q391 paired bootstrap equals an exact driver replay") {
    val poissonCdf32: Seq[Long] = {
      var term = StrictMath.exp(-1.0); var acc = 0.0
      (0 to 6).map { j =>
        if (j > 0) term /= j
        acc += term
        math.floor(acc * 4294967296.0).toLong
      }
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("nt"))
      .collect()
      .map(r => (r.getLong(0),
        (if (r.getLong(1) >= 200) 1L else 0L) -
          (if (r.getLong(2) >= 40) 1L else 0L)))
    val reps = (0 until 64).map { b =>
      var sw = 0L; var s1 = 0L
      docs.foreach { case (id, delta) =>
        val u = hashLong(s"$id#pb$b")
        val w = poissonCdf32.count(u >= _).toLong
        sw += w; s1 += w * (delta + 1)
      }
      (b.toLong, s1 * 1000000L / math.max(sw, 1L) - 1000000L)
    }
    val sortedReps = reps.sortBy { case (b, m) => (m, b) }.map(_._2)
    val point = docs.map(d => d._2 + 1).sum * 1000000L /
      docs.length - 1000000L
    val r = graft.queries.Registry.byName("q391_paired_bootstrap")
      .fn(spark, sf).collect().head
    assert(r.getLong(0) == docs.length.toLong)
    assert(r.getLong(1) == point)
    assert(r.getLong(3) == sortedReps(1), "lo")
    assert(r.getLong(4) == sortedReps(62), "hi")
    assert(r.getLong(5) ==
      reps.count(_._2 > 0).toLong * 1000000L / 64L, "pos_ppm")
    assert(r.getLong(3) <= r.getLong(4))
  }
}
