package graft

import org.apache.spark.sql.functions._

/** Round-7q pins: MRR and drift against driver replays, preference
  * pairs against a driver argmax, orphan-audit arithmetic. */
class Round7qSpec extends SparkSpec {

  test("property: q353 MRR equals a driver MIPS replay") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x ->" +
          " cast(round(cast(x as double) * 1000, 0) as bigint))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val want = emb.filter(_._1 < 20).map { case (qid, qlab, qv) =>
      val ranked = emb.filter(_._1 != qid)
        .map { case (id, lab, v) =>
          (id, lab, v.zip(qv).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (id, _, dot) => (-dot, id) }.take(10)
      val first = ranked.zipWithIndex
        .collectFirst { case ((_, lab, _), i) if lab == qlab => i + 1L }
      qid -> ((first, first.map(1000000L / _).getOrElse(0L),
        first.isDefined))
    }.toMap
    val got = graft.queries.Registry.byName("q353_mrr_at_10")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("property: q354 preference pairs equal a driver argmax/argmin") {
    val scored = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        (col("n_chars") + lit(3L) *
          size(array_distinct(graft.ops.Text.tokens(col("text"))))
            .cast("long")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = scored.groupBy(_._1).collect {
      case (src, xs) if xs.length > 1 =>
        val ch = xs.minBy(x => (-x._3, x._2))
        val rj = xs.minBy(x => (x._3, -x._2))
        src -> ((xs.length.toLong, ch._2, ch._3, rj._2, rj._3,
          ch._3 - rj._3))
    }
    val got = graft.queries.Registry.byName("q354_preference_pairs")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.nonEmpty && got == want)
    got.values.foreach { case (_, _, cs, _, rs, m) =>
      assert(m >= 0 && m == cs - rs)
    }
  }

  test("q355 orphan audit: generated FKs are clean, ppm arithmetic holds") {
    val rows = graft.queries.Registry.byName("q355_orphan_audit")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows.size == 4)
    // child->parent FKs hold by generation
    assert(rows("orders->customer")._2 == 0L)
    assert(rows("lineitem->part")._2 == 0L)
    rows.values.foreach { case (n, o, ppm) =>
      assert(ppm == o * 1000000L / n)
    }
  }

  test("property: q356 drift equals a driver replay; TV bounded") {
    val ev = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"),
        expr("unix_micros(ts) div 604800000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (mn, mx) = (ev.map(_._1).min, ev.map(_._1).max)
    val w0 = ev.map(_._2).min
    val bins = ev.groupBy(e => (e._1 - mn) * 16 / (mx - mn + 1))
      .map { case (b, xs) =>
        b -> ((xs.count(_._2 == w0).toLong, xs.count(_._2 != w0).toLong))
      }
    val t1 = bins.values.map(_._1).sum
    val t2 = bins.values.map(_._2).sum
    val tvn = bins.values.map { case (n1, n2) =>
      (BigInt(n1) * t2 - BigInt(n2) * t1).abs
    }.sum * 1000000
    val tv = (tvn / (2 * BigInt(t1) * t2)).toLong
    val chi = bins.values.map { case (n1, n2) =>
      if (n1 + n2 > 0) {
        val dd = BigInt(n1) * t2 - BigInt(n2) * t1
        dd * dd / (BigInt(t1) * t2 * (n1 + n2))
      } else BigInt(0)
    }.sum.toLong
    val row = graft.queries.Registry.byName("q356_distribution_drift")
      .fn(spark, sf).collect().head
    assert(row.getLong(0) == tv && tv >= 0 && tv <= 1000000)
    assert(row.getLong(1) == chi)
    assert(row.getLong(2) == t1 && row.getLong(3) == t2)
  }
}
