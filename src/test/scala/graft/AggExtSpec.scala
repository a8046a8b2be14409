package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Invariant + plan-shape tests for the aggregate/window/array
  * extensions (q121-q130). Value-level correctness lives in the DuckDB
  * oracles; these pin the properties and physical plans the oracle
  * can't see.
  */
class AggExtSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    Registry.byName(name).fn(spark, sf)

  test("q124 plan broadcasts the 3-row group-median table") {
    val plan = run("q124_mad").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join for the tiny median table, got:\n$plan")
  }

  test("q127 skewness/kurtosis match a driver-side brute force") {
    val rows = run("q127_skew_kurt")
      .as[(String, Double, Double)].collect()
      .map { case (k, s, kur) => k -> ((s, kur)) }.toMap
    val data = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity")
      .as[(String, Double)].collect().groupBy(_._1)
    for ((flag, xs0) <- data) {
      val xs = xs0.map(_._2)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val m2 = xs.map(x => (x - m) * (x - m)).sum / n
      val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
      val (skew, kurt) = rows(flag)
      assert(math.abs(skew - m3 / (m2 * math.sqrt(m2))) < 1e-4,
        s"$flag skew: got $skew, brute ${m3 / (m2 * math.sqrt(m2))}")
      assert(math.abs(kurt - (m4 / (m2 * m2) - 3.0)) < 1e-4,
        s"$flag kurt: got $kurt, brute ${m4 / (m2 * m2) - 3.0}")
    }
  }

  test("q129 EWMA equals the sequential recurrence per user") {
    val got = run("q129_ewma")
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, e) => u -> (n, e) }.toMap
    val hist = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    for ((u, rows) <- hist) {
      val vals = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val ewma = vals.tail.foldLeft(vals.head)((acc, x) => 0.3 * x + 0.7 * acc)
      val (n, e) = got(u)
      assert(n == vals.length)
      assert(math.abs(e - ewma) < 1e-6, s"user $u: got $e, brute $ewma")
    }
    assert(got.keySet == hist.keySet)
  }

  test("q128 with_null variant is empty-set semantics (count 0)") {
    val m = run("q128_notin_nullaware")
      .as[(String, Long)].collect().toMap
    assert(m("with_null") == 0L,
      "one NULL in a NOT IN subquery must empty the result (3VL)")
    assert(m("no_null") > 0L)
  }

  test("q130 type_bits is the OR of per-type bits; n_types counts them") {
    val got = run("q130_bit_agg")
      .as[(Long, Long, Long, Long, Long)].collect()
    val types = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
    val bit = Map("click" -> 1L, "view" -> 2L, "purchase" -> 4L, "signup" -> 8L)
    for ((u, n, tb, _, nt) <- got) {
      val expect = types(u).map(t => bit.getOrElse(t, 16L)).sum  // distinct bits
      assert(tb == expect, s"user $u: type_bits $tb != $expect")
      assert(nt == java.lang.Long.bitCount(tb).toLong)
      assert(n >= nt)
    }
  }

  test("q122 arg extremes agree with a window-ordered recompute") {
    val got = run("q122_argminmax")
      .select("l_suppkey", "last_flag", "first_status")
      .as[(Long, String, String)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_returnflag"), col("l_linestatus"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("ord"))
      .as[(Long, String, String, Long)].collect().groupBy(_._1)
    for ((k, rs) <- li) {
      val hi = rs.maxBy(_._4)._2
      val lo = rs.minBy(_._4)._3
      assert(got(k) == ((hi, lo)), s"suppkey $k")
    }
  }
}
