package graft

import org.apache.spark.sql.functions._

/** Round-7n pins: binning balance + coverage, quantile-normalization
  * laws (distribution convergence, percentile monotonicity), dedup
  * ROI conservation, and schema drift catching exactly the planted
  * mutations. */
class Round7nSpec extends SparkSpec {

  test("q342 bins: cover all rows, edges ordered, near-equal frequency") {
    val rows = graft.queries.Registry.byName("q342_equal_freq_binning")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.map(_._4).sum == n, "bins must cover every row")
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong),
      "bins 0..k contiguous")
    // edges are disjoint and ordered
    rows.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // equal-frequency up to tie mass: every bin within 2x of ideal
    val ideal = n / 10.0
    rows.foreach { case (b, _, _, cnt) =>
      assert(cnt < ideal * 2, s"bin $b holds $cnt (ideal $ideal)")
    }
  }

  test("q343 quantile normalization: monotone in value within source, output values pooled") {
    val rows = graft.queries.Registry.byName("q343_quantile_normalization")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val pooled = Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).toSet
    // normalized values come from the pooled value set
    rows.foreach { case (_, _, _, _, nv) => assert(pooled.contains(nv)) }
    // within a source: longer doc => >= percentile => >= normalized
    rows.groupBy(_._2).values.foreach { g =>
      val sorted = g.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq((_, _, v1, p1, n1), (_, _, v2, p2, n2)) =>
          if (v1 < v2) { assert(p1 <= p2); assert(n1 <= n2) }
          else { assert(p1 == p2 && n1 == n2) }
        case _ =>
      }
    }
    // percentiles land in [0, 100]
    rows.foreach { case (_, _, _, p, _) => assert(p >= 0 && p <= 100) }
  }

  test("q344 dedup ROI: byte totals conserve, waste consistent with clusters") {
    val rows = graft.queries.Registry.byName("q344_dedup_roi")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).sum == docs.length.toLong)
    assert(rows.map(_._4).sum == docs.map(_._3).sum)
    // driver replay of the waste
    val want = docs.groupBy(d => (d._1, d._2)).toSeq
      .groupBy(_._1._1).map { case (src, cls) =>
        src -> cls.map { case (_, ds) =>
          if (ds.length > 1) (ds.length - 1) * ds.head._3 else 0L
        }.sum
      }
    rows.foreach { case (src, _, _, _, waste, _) =>
      assert(waste == want.getOrElse(src, 0L))
    }
  }

  test("q345 schema drift: catches exactly the planted mutations") {
    val rows = graft.queries.Registry.byName("q345_schema_drift")
      .fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(7))).toMap
    // lang: nulls planted -> drift, v1 had zero nulls
    assert(rows("lang")._1 == 0L && rows("lang")._2 > 0L)
    assert(rows("lang")._3, "lang must flag drift")
    // source: untouched -> no drift
    assert(!rows("source")._3, "source must not flag drift")
  }
}
