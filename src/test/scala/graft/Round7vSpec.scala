package graft

import org.apache.spark.sql.functions._

/** Round-7v pins: the Hilbert walk's bijectivity + unit-step property
  * over the full 256×256 grid (the claim q372's pruning readout rests
  * on), a driver-side MASE brute force, an independent md5 replay of
  * the q374 masking draws, and q371 DSIR arithmetic/semantic laws. */
class Round7vSpec extends SparkSpec {

  /** Driver-side replica of Sampling.hashLong: first 8 hex chars of
    * md5(s), parsed base-16 — recomputed here from MessageDigest so the
    * engine's conv/md5 pipeline is checked, not trusted. */
  private def hashLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("property: q372 Hilbert chain is a bijective unit-step walk on 256x256") {
    // Run the query's OWN expression chain (the exact SQL strings that
    // q372 compiles) over every grid cell, then assert the two defining
    // Hilbert properties: d is a permutation of 0..65535 (bijective —
    // footer min/max stats partition the grid into disjoint files) and
    // consecutive d are 4-neighbors (unit steps — the locality that
    // makes Hilbert prune tighter than Z-order's diagonal jumps).
    var g = spark.range(65536).select(
      (col("id") % 256).as("ox"), (col("id") / 256).cast("long").as("oy"),
      (col("id") % 256).as("hx"), (col("id") / 256).cast("long").as("hy"),
      lit(0L).as("hd"))
    for (lv <- graft.queries.QueriesRound7v.hilbertLevels) {
      val (x2, y2, d2) = graft.queries.QueriesRound7v.hilbertLevel(lv, 256, "div")
      g = g.select(col("ox"), col("oy"),
        expr(x2).as("hx"), expr(y2).as("hy"), expr(d2).as("hd"))
    }
    val walk = g.select("ox", "oy", "hd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(walk.length == 65536)
    assert(walk.head._3 == 0L && walk.last._3 == 65535L)
    assert(walk.map(_._3).distinct.length == 65536) // bijection
    walk.sliding(2).foreach { case Array((x1, y1, d1), (x2b, y2b, _)) =>
      val step = math.abs(x2b - x1) + math.abs(y2b - y1)
      assert(step == 1, s"non-unit step after d=$d1: ($x1,$y1)->($x2b,$y2b)")
    }
  }

  test("property: q373 MASE equals a driver-side brute force") {
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val hourly = raw.groupBy(identity).map { case ((t, h), v) =>
      (t, h) -> v.length.toLong }
    def lagSum(lag: Int): Map[String, (Long, Long)] =
      hourly.toSeq.flatMap { case ((t, h), c) =>
        hourly.get((t, h - lag)).map(p => t -> math.abs(c - p))
      }.groupBy(_._1).map { case (t, v) =>
        t -> ((v.size.toLong, v.map(_._2).sum)) }
    val seas = lagSum(24); val naive = lagSum(1)
    val got = graft.queries.Registry.byName("q373_mase_forecast")
      .fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) == seas(t), s"$t seas")
      assert((r.getLong(3), r.getLong(4)) == naive(t), s"$t naive")
      val (ns, ss) = seas(t); val (nn, sn) = naive(t)
      if (sn > 0)
        assert(r.getLong(5) == ss * nn * 1000000L / (sn * ns), s"$t mase")
    }
  }

  test("property: q374 masking plan equals an independent md5 replay") {
    // token COUNTS come from the engine's tokenizer (shared), but every
    // draw — selection, role, positional checksum — is replayed through
    // MessageDigest md5 here, independent of both Spark's md5()/conv()
    // and DuckDB's md5().
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.ops.Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = graft.queries.Registry.byName("q374_mlm_masking_plan")
      .fn(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == nTok.filter(_._2 > 0).keySet)
    got.foreach { r =>
      val id = r.getLong(0)
      var (sel, mask, rnd, keep, ck) = (0L, 0L, 0L, 0L, 0L)
      for (pos <- 1 to nTok(id)) {
        if (hashLong(s"$id#m$pos") % 100 < 15) {
          sel += 1; ck += pos
          hashLong(s"$id#r$pos") % 10 match {
            case v if v < 8 => mask += 1
            case 8L => rnd += 1
            case _ => keep += 1
          }
        }
      }
      assert(r.getLong(1) == nTok(id).toLong, s"doc $id n_tokens")
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)) == ((sel, mask, rnd, keep, ck)), s"doc $id draws")
    }
  }

  test("law: q371 DSIR weights are exact and target-discriminative") {
    val rows = graft.queries.Registry.byName("q371_dsir_importance")
      .fn(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, bits, milli) =>
      // Spark's div truncates toward zero — pin the exact readout
      assert(milli == bits * 1000L / n)
      assert(math.abs(bits) <= 64L * n) // per-token weight is ≤ 64 bits
    }
    // the DSIR premise: English docs (the target slice) must score
    // strictly higher per token on average than the rest
    val (en, rest) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val mEn = en.map(_._4).sum.toDouble / en.length
    val mRest = rest.map(_._4).sum.toDouble / rest.length
    assert(mEn > mRest, s"en mean $mEn !> rest mean $mRest")
  }
}
