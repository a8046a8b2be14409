package graft

import org.apache.spark.sql.functions._

/** Round-7u pins: pass@k against exhaustive subset enumeration, the
  * Bradley–Terry integer fixed point against an independent float MM
  * fit, UniMax conservation/cap/uniformity laws, and pointer-doubling
  * against the closed-form chain root. */
class Round7uSpec extends SparkSpec {

  test("property: q367 pass@4 ppm equals exhaustive subset enumeration") {
    // 1 − C(8−c,4)/C(8,4) must equal the average over ALL C(8,4)
    // sample subsets of "subset contains ≥1 passing sample" — the
    // estimator's defining identity, checked for every c. The query's
    // ppm convention is 1e6 − floor(complement·1e6) (the literal
    // 1 − C/C form), so the enumeration side is folded the same way
    // from the enumerated MISS count; the rational identity itself is
    // pinned exactly first (num/1680 == misses/70 with no rounding).
    val idx = (0 until 8).combinations(4).toSeq
    for (c <- 0 to 8) {
      val passSet = (0 until c).toSet // which samples pass is exchangeable
      val misses = idx.count(sub => !sub.exists(passSet.contains))
      val num = BigInt((8 - c) * (7 - c) * (6 - c) * (5 - c))
      assert(num * idx.length == BigInt(misses) * 1680, s"rational c=$c")
      val exactPpm = BigInt(1000000) - BigInt(misses) * 1000000 / idx.length
      val formulaPpm = BigInt(1000000) - num * 1000000 / 1680
      assert(formulaPpm == exactPpm, s"c=$c")
    }
    // and the engine's histogram covers all docs with valid ppm values
    val rows = graft.queries.Registry.byName("q367_pass_at_k")
      .fn(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == 500L)
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(2) == 1000000L - ((8 - c) * 1000000L) / 8)
    }
  }

  test("property: q368 integer BT tracks an independent float MM fit") {
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val byId = base.map(t => t._1 -> t).toMap
    val matches = base.flatMap { case (id, s1, c1) =>
      byId.get(id + 1).collect {
        case (_, s2, c2) if s2 != s1 =>
          if (c1 >= c2) (s1, s2) else (s2, s1)
      }
    }
    val wins = matches.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val pairN = matches.map { case (a, b) =>
      (Seq(a, b).min, Seq(a, b).max) }.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val items = pairN.keys.flatMap(p => Seq(p._1, p._2)).toSet
    // independent float MM fit, 3 rounds from 1.0
    var s = items.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      s = items.map { i =>
        val d = pairN.collect {
          case ((x, y), n) if x == i || y == i =>
            val j = if (x == i) y else x
            n.toDouble / (s(i) + s(j))
        }.sum
        i -> (if (d == 0) 0.0 else wins.getOrElse(i, 0L).toDouble / d)
      }.toMap
    }
    val got = graft.queries.Registry.byName("q368_bradley_terry")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.keySet == items)
    got.foreach { case (src, micro) =>
      val f = s(src) * 1e6
      assert(math.abs(micro - f) <= math.max(2000.0, f * 0.002),
        s"$src: int=$micro float=$f")
    }
  }

  test("law: q369 UniMax conserves the budget and respects caps") {
    val rows = graft.queries.Registry.byName("q369_unimax_mixture")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3)))
    val total = rows.map(_._2).sum
    val b = total * 9 / 10
    // conservation: Σ alloc == B (not every language is capped here)
    assert(rows.map(_._4).sum == b)
    // cap law: no language exceeds one epoch; capped rows sit AT it
    rows.foreach { case (lang, t, capped, alloc) =>
      assert(alloc <= t, s"$lang over cap")
      if (capped) assert(alloc == t, s"$lang capped but alloc<t")
    }
    // uniformity: uncapped allocations differ by at most 1
    val un = rows.filter(!_._3).map(_._4)
    if (un.nonEmpty) assert(un.max - un.min <= 1)
    // capped languages are exactly those whose corpus fits under the
    // share the uncapped rows received
    val share = if (un.nonEmpty) un.min else Long.MaxValue
    rows.foreach { case (lang, t, capped, _) =>
      if (capped) assert(t <= share + 1, s"$lang capped above share")
    }
  }

  test("property: q370 pointer doubling equals the closed-form root") {
    // ids are dense from 0, so node i's terminal is i − (i mod 16)
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val want = ids.groupBy(i => i - (i % 16)).map { case (root, xs) =>
      root -> ((xs.length.toLong, xs.max - root))
    }
    val got = graft.queries.Registry.byName("q370_pointer_doubling")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want && got.nonEmpty)
  }
}
