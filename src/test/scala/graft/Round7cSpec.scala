package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-7c semantics pins: clustering coefficient on a known graph,
  * and driver-side brute-force replays of q298 (t-closeness) and q302
  * (event motifs) — the oracle-independence discipline (a third
  * computation path next to the DuckDB mirror). */
class Round7cSpec extends SparkSpec {
  import spark.implicits._

  test("clusteringCoefficient: triangle + pendant, any input orientation") {
    // triangle {1,2,3} plus pendant edge 4—1; pass BOTH orientations
    // and a duplicate to prove internal canonicalization
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (4L, 1L),
      (1L, 4L)).toDF("id_a", "id_b")
    val got = Graph.clusteringCoefficient(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // node 1: deg 3, 1 triangle, cc = 2/(3*2) = 1/3
    assert(got(1L) == ((3L, 1L, 333333L)))
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((2L, 1L, 1000000L)))
    // pendant: degree 1 -> cc defined as 0
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("property: q298 t-closeness equals a driver brute force") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rows = docs.map { case (l, s, n) =>
      ((l, s, (n / 100) * 100), n % 7)
    }
    val n = rows.length.toLong
    val g = rows.groupBy(_._2).map { case (v, xs) => v -> xs.length.toLong }
    val want = rows.groupBy(_._1).map { case (cls, xs) =>
      val nc = xs.length.toLong
      val cv = xs.groupBy(_._2).map { case (v, ys) => v -> ys.length.toLong }
      val num = g.map { case (v, gv) =>
        math.abs(cv.getOrElse(v, 0L) * n - gv * nc)
      }.sum
      cls -> (num * 1000000L / (2L * nc * n))
    }
    val got = graft.queries.Registry.byName("q298_t_closeness")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        r.getLong(4)).toMap
    assert(got.nonEmpty && got == want)
  }

  test("property: q302 event motifs equal a driver regex brute force") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getString(3).head)))
    def countMotif(trace: String, pat: String): Long = {
      val m = java.util.regex.Pattern.compile(pat).matcher(trace)
      var c = 0L
      while (m.find()) c += 1
      c
    }
    val want = ev.groupBy(_._1).map { case (u, xs) =>
      val trace = xs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).mkString
      u -> ((xs.length.toLong, countMotif(trace, "v+c"),
        countMotif(trace, "cp"), countMotif(trace, "v+cp"),
        countMotif(trace, "ee")))
    }
    val got = graft.queries.Registry.byName("q302_event_motifs")
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("q301 readability: output integers are internally consistent") {
    val rows = graft.queries.Registry.byName("q301_readability")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, se, sy, fk) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(se >= 1L)
      assert(fk == 390000L * w / se + 11800000L * sy / math.max(w, 1L)
        - 15590000L)
      assert(r.getBoolean(5) == (fk > 12000000L))
    }
  }
}
