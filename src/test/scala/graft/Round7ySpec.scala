package graft

import org.apache.spark.sql.functions._

/** Round-7y pins: FD repair against a driver majority replay, the
  * split-conformal coverage guarantee, and the 80%-rule flag law. */
class Round7ySpec extends SparkSpec {

  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q383 FD repair equals a driver majority-vote replay") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val obs = cust.map { case (ck, nk) =>
      val h = hashLong(s"$ck#fd"); val rk = nat(nk)
      nk -> (if (h % 20 == 0) (rk + 1 + h % 4) % 5 else rk)
    }
    val want = obs.groupBy(_._1).map { case (nk, rows) =>
      val counts = rows.groupBy(_._2).map { case (r, v) => r -> v.size }
      val maj = counts.toSeq.maxBy { case (r, c) => (c, -r) }._1
      nk -> ((rows.size.toLong, maj,
        rows.count(_._2 != maj).toLong))
    }
    val got = graft.queries.Registry.byName("q383_fd_repair")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want && got.nonEmpty)
    // the plant is live: some repairs happened somewhere
    assert(got.values.map(_._3).sum > 0)
  }

  test("law: q384 conformal coverage meets the 90% guarantee") {
    val r = graft.queries.Registry.byName("q384_conformal_interval")
      .fn(spark, sf).collect().head
    val (nCal, qhat, nTest, nCov, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nCal > 0 && nTest > 0 && qhat >= 0)
    assert(ppm == nCov * 1000000L / nTest)
    // split conformal: coverage ≥ 1 − α in expectation; the md5 split
    // is exchangeable, so allow finite-sample slack of 5 points
    assert(ppm >= 850000L, s"coverage $ppm below guarantee band")
    // q-hat is the exact ⌈(n+1)·0.9⌉-th smallest calibration score
    val scores = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("nt"))
      .collect()
      .filter(row => hashLong(row.getLong(0).toString) % 100 < 50)
      .map(row => math.abs(row.getLong(1) - 6 * row.getLong(2)))
      .sorted
    val k = math.min((scores.length + 1) * 9 / 10, scores.length)
    assert(qhat == scores(k - 1), s"qhat $qhat vs ${scores(k - 1)}")
  }

  test("law: q385 flags exactly the groups under the 80% rule") {
    val rows = graft.queries.Registry.byName("q385_fairness_audit")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val nAll = rows.map(_._2).sum; val sAll = rows.map(_._3).sum
    rows.foreach { case (lang, n, s, selPpm, ratio, flagged) =>
      assert(selPpm == s * 1000000L / n)
      assert(ratio == (BigInt(s) * nAll * 1000000 / (BigInt(n) * sAll)).toLong)
      assert(flagged == (BigInt(s) * nAll * 5 < BigInt(sAll) * n * 4),
        s"$lang flag law")
    }
  }
}
