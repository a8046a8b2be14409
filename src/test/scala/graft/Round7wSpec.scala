package graft

import org.apache.spark.sql.functions._

/** Round-7w pins: the integer Fellegi–Sunter EM against an
  * independent float EM, the q376 dynamic-partition-pruning plan
  * shape, Naive Bayes on a planted class vocabulary (diagonal) and on
  * the label-independent corpus (prior collapse), and the DoReMi
  * weight laws. */
class Round7wSpec extends SparkSpec {

  test("property: q375 integer EM tracks an independent float EM") {
    val rows = graft.queries.Registry.byName("q375_fellegi_sunter")
      .fn(spark, sf).collect()
      .map(r => (Seq(r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // float EM, same init, same 2 rounds + final E-step, no rounding
    var (lam, m, u) = (0.5, Seq(0.9, 0.9, 0.9), Seq(0.1, 0.1, 0.1))
    def post(g: Seq[Long], lm: Double, mm: Seq[Double], uu: Seq[Double]) = {
      val pm = g.zip(mm).map { case (b, p) => if (b == 1) p else 1 - p }.product
      val pu = g.zip(uu).map { case (b, p) => if (b == 1) p else 1 - p }.product
      lm * pm / (lm * pm + (1 - lm) * pu)
    }
    for (_ <- 1 to 2) {
      val w = rows.map { case (g, n, _, _) => (g, n, post(g, lam, m, u)) }
      val s1 = w.map { case (_, n, p) => n * p }.sum
      val s0 = w.map { case (_, n, p) => n * (1 - p) }.sum
      m = (0 until 3).map(f =>
        w.collect { case (g, n, p) if g(f) == 1 => n * p }.sum / s1)
      u = (0 until 3).map(f =>
        w.collect { case (g, n, p) if g(f) == 1 => n * (1 - p) }.sum / s0)
      lam = s1 / w.map(_._2).sum
    }
    rows.foreach { case (g, _, milli, lamMilli) =>
      val f = post(g, lam, m, u) * 1000
      assert(math.abs(milli - f) <= math.max(25.0, f * 0.05),
        s"pattern $g: int=$milli float=$f")
      assert(math.abs(lamMilli - lam * 1000) <= 25.0)
    }
    // the all-agree pattern must dominate the all-disagree pattern
    val byPat = rows.map(r => r._1 -> r._3).toMap
    assert(byPat(Seq(1L, 1L, 1L)) > byPat(Seq(0L, 0L, 0L)))
  }

  test("plan: q376 fact scan carries a dynamic partition pruning filter") {
    val df = graft.queries.Registry.byName("q376_dpp_join").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("property: q377 NB goes diagonal on planted vocabulary, collapses to prior without signal") {
    import spark.implicits._
    // planted: three classes with DISJOINT marker vocabularies — the
    // trained matrix must be perfectly diagonal on the held-out split
    val planted = (0 until 300).map { i =>
      val cls = Seq("alpha", "beta", "gamma")(i % 3)
      val words = Seq.tabulate(30)(j => s"$cls${(i * 7 + j) % 5}")
      (i.toLong, cls, words.mkString(" "))
    }.toDF("doc_id", "label", "text")
    val conf = graft.ops.Classify
      .naiveBayesConfusion(planted, "doc_id", "label", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.nonEmpty)
    conf.foreach { case (t, p, n) =>
      assert(t == p, s"planted off-diagonal: $t -> $p ($n docs)") }
    assert(conf.map(_._3).sum > 50) // held-out split is non-trivial
    // label-independent corpus: the correct NB outcome is the train
    // prior's argmax for the overwhelming majority of test docs
    val real = graft.queries.Registry.byName("q377_naive_bayes")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = real.map(_._3).sum
    val majority = real.groupBy(_._2).map { case (p, v) =>
      p -> v.map(_._3).sum }.maxBy(_._2)
    assert(majority._2 >= total * 9 / 10,
      s"expected prior collapse, got spread: ${real.mkString(", ")}")
  }

  test("law: q378 DoReMi weights conserve ppm and use exact power-of-2 boosts") {
    val rows = graft.queries.Registry.byName("q378_doremi_weights")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._6).sum == 1000000L) // exact conservation
    rows.foreach { case (src, _, _, excess, mult, _) =>
      assert(mult == (1L << math.min(excess / 250, 12L).toInt),
        s"$src mult law")
    }
    // at least one source sits at/below the mean and stays unboosted
    assert(rows.exists { case (_, _, _, excess, mult, _) =>
      excess == 0L && mult == 1L })
    // boosted sources gain weight share relative to token share:
    // weight_ppm/scaled is ~constant, so ppm per token scales with mult
    val unb = rows.filter(_._5 == 1L); val bst = rows.filter(_._5 > 1L)
    if (unb.nonEmpty && bst.nonEmpty) {
      val maxUnb = unb.map(r => r._6.toDouble / r._2).max
      val minBst = bst.map(r => r._6.toDouble / r._2 / r._5).min
      // per-token ppm divided by mult is the base rate — equal across
      // sources up to largest-remainder ±1 rounding
      assert(minBst * 1.01 >= maxUnb * 0.99 || bst.forall(r =>
        r._6.toDouble / r._2 > maxUnb),
        "boosted sources must out-weigh unboosted per token")
    }
  }
}
