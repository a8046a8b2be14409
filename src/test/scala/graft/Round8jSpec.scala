package graft

import graft.ops.FixedPoint
import graft.queries.{QueriesRound8j, Registry}
import org.apache.spark.sql.functions._

/** Oracle-independence properties for the round-8j batch: the Luhn
  * fold vs a driver implementation, the planted-banner law of the
  * host-template strip, and the SPRT decision vs a sequential driver
  * replay.
  */
class Round8jSpec extends SparkSpec {

  test("q456 Luhn fold equals the textbook right-to-left algorithm") {
    // reference: from the RIGHT, double every second digit (2nd, 4th,
    // ...), subtract 9 when > 9 — for 16-digit strings this is the
    // same as doubling odd LEFT positions, which the SQL fold uses
    def luhnRef(s: String): Int =
      s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
      }.sum
    val rnd = new scala.util.Random(456)
    val cases = (1 to 60).map(_ =>
      (1 to 16).map(_ => rnd.nextInt(10)).mkString)
    import spark.implicits._
    val got = cases.toDF("cc")
      .select(col("cc"),
        expr(QueriesRound8j.luhnSumSpark("cc", 16)).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for (c <- cases) assert(got(c) === luhnRef(c), s"cc=$c")
    // a constructed check digit always validates
    for (c <- cases.take(10)) {
      val p = c.take(15)
      val chk = (10 - luhnRef(p + "0") % 10) % 10
      assert(luhnRef(p + chk.toString) % 10 === 0)
    }
  }

  test("q458 planted banners: every doc loses exactly its banner") {
    val out = Registry.byName("q458_host_template_strip").fn(spark, sf)
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Long]("n_struck") === 1L,
        s"doc ${r.get(0)}: struck ${r.getAs[Long]("n_struck")}")
      assert(r.getAs[Long]("n_segs") >= 1L)
    }
  }

  test("q460 SPRT decision equals a sequential driver replay") {
    val incS = FixedPoint.lnMicroLong(FixedPoint.ratioFp20Long(1, 5))
    val incF = FixedPoint.lnMicroLong(FixedPoint.ratioFp20Long(1, 4))
    val thr = FixedPoint.lnMicroLong(FixedPoint.ratioFp20Long(18, 1))
    // sanity: table-ln constants within one table step of libm
    assert(math.abs(incS - math.log(1.2) * 1e6) < 6000)
    assert(math.abs(incF - math.log(1.25) * 1e6) < 6000)
    assert(math.abs(thr - math.log(19.0) * 1e6) < 6000)

    val ids = Tables.events(spark, sf).select("event_id")
      .collect().map(_.getLong(0)).sorted
    var llr = 0L
    var hit: Option[(Long, Long, Long)] = None
    var n = 0L; var s = 0L
    for (id <- ids if hit.isEmpty) {
      n += 1
      if (id % 5 < 3) { s += 1; llr += incS } else llr -= incF
      if (math.abs(llr) >= thr) hit = Some((n, s, llr))
    }
    val want = hit.get
    val got = Registry.byName("q460_sprt_readout").fn(spark, sf)
      .collect().head
    assert(got.getAs[Long]("n_at_decision") === want._1)
    assert(got.getAs[Long]("n_succ_at_decision") === want._2)
    assert(got.getAs[Long]("llr_at_decision") === want._3)
    assert(got.getAs[String]("decision") === "accept_h1")
  }
}
