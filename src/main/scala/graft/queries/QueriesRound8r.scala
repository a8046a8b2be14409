package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-8 eighteenth batch: exponentially time-decayed popularity in
  * exact powers of two (q487) and unordered frequent triples over
  * capped baskets (q488).
  */
object QueriesRound8r {

  val defs: Seq[QueryDef] = Seq(

    // ---- q487: time-decayed popularity (exact half-life) ------------------
    // Recency-weighted counts without a single float: with a
    // power-of-two decay per 7-day bucket, the decayed count is
    // Σ_d c_d div 2^((T−d) div 7) — integer shifts, exact on any
    // engine and any partitioning (the float e^{−λt} version is
    // neither). The readout that ranks event types by CURRENT
    // popularity instead of all-time volume; day histogram is one
    // map-side-combining agg, the decay fold runs on the
    // O(types × days) frame.
    QueryDef("q487_decayed_popularity",
      (s, d) => {
        val days = events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
        days
          .withColumn("__t", expr("max(day) OVER ()"))
          .withColumn("__sh", expr("(__t - day) div 7"))
          .withColumn("__dec",
            when(col("__sh") > 62, lit(0L))
              .otherwise(expr("c div shiftleft(1L, CAST(__sh AS INT))")))
          .groupBy("event_type")
          .agg(sum("c").as("n_total"), sum("__dec").as("n_decayed"))
          .withColumn("decay_keep_ppm",
            expr("(n_decayed * 1000000) div n_total"))
          .orderBy("event_type")
      },
      Some("""WITH dd AS (SELECT event_type,
        |    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT max(day) AS t FROM dd),
        |dec AS (SELECT event_type, c,
        |    CASE WHEN (t.t - day) // 7 > 62 THEN 0
        |      ELSE c // (1::BIGINT << CAST((t.t - day) // 7 AS INTEGER))
        |    END AS dc
        |  FROM dd, t)
        |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_total,
        |  CAST(sum(dc) AS BIGINT) AS n_decayed,
        |  CAST((sum(dc) * 1000000) // sum(c) AS BIGINT)
        |    AS decay_keep_ppm
        |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q488: frequent triples over capped baskets ------------------------
    // One level past q165's pairs and ORTHOGONAL to q312's ordered
    // 3-sequences: unordered 3-itemsets by basket support, built as
    // pair⋈item under the basket-cap discipline (baskets above 8
    // items excluded up front — the mega-basket m³ guard), support ≥ 2,
    // lift = P(abc)/(P(a)P(b)P(c)) in cross-multiplied integers
    // (c_abc·S²·10⁶ div c_a·c_b·c_c). Top 20 by support;
    // TakeOrderedAndProject ends it.
    QueryDef("q488_frequent_triples",
      (s, d) => {
        val items = lineitem(s, d)
          .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
          .distinct()
        val sizes = items.groupBy("b").agg(count(lit(1)).as("__sz"))
        val ok = items.join(sizes.where(col("__sz") <= 8), "b")
          .select("b", "i")
        val nb = ok.select("b").distinct().agg(count(lit(1)).as("n_b"))
        val single = ok.groupBy("i").agg(count(lit(1)).as("ci"))
        val triples = ok.as("x")
          .join(ok.as("y"), col("x.b") === col("y.b") &&
            col("x.i") < col("y.i"))
          .join(ok.as("z"), col("y.b") === col("z.b") &&
            col("y.i") < col("z.i"))
          .groupBy(col("x.i").as("a"), col("y.i").as("bb"),
            col("z.i").as("c"))
          .agg(count(lit(1)).as("support"))
          .where(col("support") >= 2)
        triples
          .join(broadcast(single.withColumnRenamed("i", "a")
            .withColumnRenamed("ci", "c_a")), "a")
          .join(broadcast(single.withColumnRenamed("i", "bb")
            .withColumnRenamed("ci", "c_b")), "bb")
          .join(broadcast(single.withColumnRenamed("i", "c")
            .withColumnRenamed("ci", "c_c")), "c")
          .crossJoin(broadcast(nb))
          .select(col("a"), col("bb").as("b"), col("c"), col("support"),
            expr("(support * n_b * n_b * 1000000) div (c_a * c_b * c_c)")
              .as("lift_micro"))
          .orderBy(col("support").desc, col("a"), col("b"), col("c"))
          .limit(20)
      },
      Some("""WITH it AS (SELECT DISTINCT l_orderkey AS b,
        |    l_partkey AS i FROM lineitem),
        |sz AS (SELECT b, count(*) AS s FROM it GROUP BY 1),
        |ok AS (SELECT it.b, it.i FROM it JOIN sz ON it.b = sz.b
        |  WHERE sz.s <= 8),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_b FROM ok),
        |sg AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM ok
        |  GROUP BY 1),
        |tr AS (SELECT x.i AS a, y.i AS b2, z.i AS c,
        |    CAST(count(*) AS BIGINT) AS support
        |  FROM ok x JOIN ok y ON x.b = y.b AND x.i < y.i
        |  JOIN ok z ON y.b = z.b AND y.i < z.i
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
        |SELECT tr.a, tr.b2 AS b, tr.c, tr.support,
        |  CAST((tr.support * nb.n_b * nb.n_b * 1000000) //
        |    (sa.ci * sb.ci * sc.ci) AS BIGINT) AS lift_micro
        |FROM tr JOIN sg sa ON tr.a = sa.i
        |JOIN sg sb ON tr.b2 = sb.i JOIN sg sc ON tr.c = sc.i, nb
        |ORDER BY tr.support DESC, tr.a, tr.b2, tr.c LIMIT 20""".stripMargin))
  )
}
