package graft

import graft.queries.Registry

/** q523-q525 re-verified: pure-Scala replays and the stream ≡ batch
  * law for the Holt twin.
  */
class Round9rSpec extends SparkSpec {

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.map(c =>
        if (c.isDigit || (c >= 'a' && c <= 'z')) c else ' ')
      .split("\\s+").filter(_.nonEmpty).toSeq

  test("q523 Good-Turing/Chao1 equals the pure-Scala replay") {
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => normToks(r.getString(0)).sliding(3)
        .filter(_.size == 3).map(_.mkString(" ")).toSeq)
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fof = counts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val v = counts.size.toLong
    val n = toks.size.toLong
    def nr(r: Long) = fof.getOrElse(r, 0L)
    val r = Registry.byName("q523_vocab_growth").fn(spark, sf)
      .collect().head
    assert(r.getAs[Long]("v") == v)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n1") == nr(1))
    assert(r.getAs[Long]("n2") == nr(2))
    assert(r.getAs[Long]("unseen_mass_ppm") == nr(1) * 1000000 / n)
    assert(r.getAs[Long]("chao1") ==
      v + nr(1) * nr(1) / math.max(2 * nr(2), 1L))
    assert(r.getAs[Long]("rstar1_micro") ==
      2 * nr(2) * 1000000 / math.max(nr(1), 1L))
    assert(nr(1) > 0, "no singletons — Good-Turing vacuous on this corpus")
  }

  test("q524 Mantel-Haenszel equals the pure-Scala replay") {
    val rows = Tables.documents(spark, sf)
      .selectExpr("lang", "CAST(substring(source, 4, 10) AS INT) % 2 = 0",
        "n_chars >= 300").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val strata = rows.groupBy(_._1).view.mapValues { g =>
      val a = g.count(x => x._2 && x._3).toLong
      val b = g.count(x => x._2 && !x._3).toLong
      val c = g.count(x => !x._2 && x._3).toLong
      val dd = g.count(x => !x._2 && !x._3).toLong
      (a, b, c, dd)
    }.toMap
    val num = strata.values.map { case (a, b, c, dd) =>
      a * dd * 1048576L / (a + b + c + dd) }.sum
    val den = strata.values.map { case (a, b, c, dd) =>
      b * c * 1048576L / (a + b + c + dd) }.sum
    val mh = num * 1000 / math.max(den, 1L)
    val (ta, tb, tc, td) = strata.values.foldLeft((0L, 0L, 0L, 0L)) {
      case ((x1, x2, x3, x4), (a, b, c, dd)) =>
        (x1 + a, x2 + b, x3 + c, x4 + dd)
    }
    val crude = ta * td * 1000 / math.max(tb * tc, 1L)
    val got = Registry.byName("q524_mantel_haenszel").fn(spark, sf).collect()
    got.foreach { r =>
      val (a, b, c, dd) = strata(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        (a, b, c, dd))
      assert(r.getAs[Long]("or_milli") ==
        a * dd * 1000 / math.max(b * c, 1L))
      assert(r.getAs[Long]("crude_or_milli") == crude)
      assert(r.getAs[Long]("mh_or_milli") == mh)
    }
    assert(got.length == strata.size)
  }

  test("q525 streaming Holt equals the q520 batch fold (stream = batch)") {
    val batch = Registry.byName("q520_holt_forecast").fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val stream = Registry.byName("q525_streaming_holt").fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(stream.keySet == batch.keySet)
    stream.foreach { case (u, (n, l, b, f)) =>
      assert((l, b, f) == batch(u), s"user $u: stream != batch")
      assert(n > 0)
    }
  }
}
