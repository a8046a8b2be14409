package graft

import org.apache.spark.sql.functions._

/** Round-7f pins: Pareto frontier and TWAP against driver brute
  * forces, allocation conservation, ECE calibration sanity. */
class Round7fSpec extends SparkSpec {

  test("property: q311 Pareto frontier equals a quadratic driver brute force") {
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(graft.ops.Text.tokens(col("text"))))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = scored.filter { case (_, s1, s2) =>
      !scored.exists { case (_, t1, t2) =>
        t1 >= s1 && t2 >= s2 && (t1 > s1 || t2 > s2)
      }
    }.map(t => t._1 -> ((t._2, t._3))).toMap
    val got = graft.queries.Registry.byName("q311_pareto_frontier")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got == want)
    // cross-pin: the distinct-x collapse algorithm agrees with the
    // grid-pruned skyline helper (q203's path) on the same dims —
    // three independent computations of one operator
    val viaHelper = graft.ops.Relational.paretoFrontier(
        Tables.documents(spark, sf).select(col("doc_id"),
          col("n_chars").as("s1"),
          size(array_distinct(graft.ops.Text.tokens(col("text"))))
            .cast("long").as("s2")),
        "s1", "s2", Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(viaHelper == want)
  }

  test("property: q309 TWAP equals a driver brute force") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val want = ev.groupBy(_._1).map { case (u, xs) =>
      val sorted = xs.map(_._2).sortBy(t => (t._1, t._2)).toSeq
      val gaps = sorted.zip(sorted.drop(1)).map {
        case ((t1, _, v), (t2, _, _)) => (v, (t2 - t1) / 1000L)
      }
      val span = gaps.map(_._2).sum
      val num = gaps.map { case (v, dt) => v * dt }.sum
      u -> ((xs.length.toLong, span,
        if (span > 0) Some(num * 1000L / span) else None))
    }
    val got = graft.queries.Registry.byName("q309_time_weighted_avg")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q310 allocation: quotas conserve the budget and follow variance") {
    val rows = graft.queries.Registry.byName("q310_variance_allocation")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(4)).sum == 10000L)
    // quota never exceeds floor + 1 of the ideal share
    val totW = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      val ideal = 10000L * r.getLong(3) / totW
      assert(r.getLong(4) >= ideal && r.getLong(4) <= ideal + 1)
    }
  }

  test("q308 ECE: bins are consistent and the calibrated scorer scores small") {
    val rows = graft.queries.Registry.byName("q308_calibration_ece")
      .fn(spark, sf).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getLong(1)).sum
    var acc = 0L
    rows.foreach { r =>
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)))
      acc += r.getLong(5) * r.getLong(1)
    }
    val ece = acc / n
    rows.foreach(r => assert(r.getLong(6) == ece))
    // P(y|score) = score/1000 by construction: big ECE = a binning bug
    assert(ece < 200000L, s"ece_ppm $ece")
  }
}
