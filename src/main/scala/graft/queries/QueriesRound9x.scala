package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 twenty-fourth batch: max-min fair quota allocation
  * (water-filling).
  */
object QueriesRound9x {

  val defs: Seq[QueryDef] = Seq(

    // ---- q531: max-min fair quota allocation -------------------------------------
    // The multi-tenant budget primitive (crawl slots, API quota,
    // training-token budgets): give every user min(demand, w) where
    // the water level w is the largest level the capacity funds —
    // small demands fully served, heavy hitters capped at w,
    // max-min fairness by construction. Closed form off the demand
    // VALUE HISTOGRAM (no per-user iteration): v* = max demand value
    // v with sumBelow(v) + nAbove(v)·v ≤ C, then w = (C − sumBelow*)
    // div nAbove* — cums over the value-domain frame only (the q519
    // discipline), broadcast back to tag every user. All-integer,
    // leftover reported, Σ alloc ≤ C pinned in-query.
    QueryDef("q531_waterfill_quota",
      (s, d) => {
        val dem = events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("demand"))
        val tot = dem.agg(sum("demand").as("total"),
          count(lit(1)).as("n"))
          .select(col("total"), col("n"),
            expr("total div 2").as("cap"))
        val hist = dem.groupBy("demand").agg(count(lit(1)).as("f"))
        val wv = Window.orderBy("demand")
          .rowsBetween(Window.unboundedPreceding, 0)
        // virtual level 0 (always feasible): when even the smallest
        // demands overrun the capacity, v* = 0 and w degrades to the
        // equal share cap div n instead of an empty result
        val cum = hist
          .withColumn("nBelow", sum("f").over(wv))
          .withColumn("sumBelow", sum(expr("demand * f")).over(wv))
          .unionByName(hist.sparkSession.range(1)
            .select(lit(0L).as("demand"), lit(0L).as("f"),
              lit(0L).as("nBelow"), lit(0L).as("sumBelow")))
          .crossJoin(broadcast(tot))
        val star = cum
          .where(expr("sumBelow + (n - nBelow) * demand <= cap"))
          .orderBy(desc("demand")).limit(1)
          .select(col("demand").as("vstar"), col("nBelow").as("nb"),
            col("sumBelow").as("sb"), col("n"), col("cap"), col("total"))
        val level = star.select(col("total"), col("n"), col("cap"),
          when(col("nb") === col("n"), col("vstar"))
            .otherwise(expr("(cap - sb) div (n - nb)")).as("w"))
        val alloc = dem.crossJoin(broadcast(level))
          .select(col("user_id"), col("demand"),
            least(col("demand"), col("w")).as("alloc"),
            (col("demand") > col("w")).cast("long").as("capped"),
            col("w").as("level"), col("cap"))
        alloc
          .crossJoin(broadcast(alloc.agg(sum("alloc").as("__sa"))
            .select(col("__sa"))))
          .select(col("user_id"), col("demand"), col("alloc"),
            col("capped"), col("level"), col("cap"),
            (col("cap") - col("__sa")).as("leftover"),
            (col("__sa") <= col("cap")).as("within_cap"))
          .orderBy("user_id")
      },
      Some("""WITH dem AS (SELECT user_id, CAST(count(*) AS BIGINT)
        |    AS demand FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(demand) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(demand) AS BIGINT) // 2 AS cap FROM dem),
        |hist AS (SELECT demand, CAST(count(*) AS BIGINT) AS f
        |  FROM dem GROUP BY 1),
        |cum0 AS (SELECT demand,
        |    CAST(sum(f) OVER (ORDER BY demand) AS BIGINT) AS nBelow,
        |    CAST(sum(demand * f) OVER (ORDER BY demand) AS BIGINT)
        |      AS sumBelow
        |  FROM hist),
        |cum AS (SELECT * FROM cum0 UNION ALL
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |star AS (SELECT cum.demand AS vstar, cum.nBelow AS nb,
        |    cum.sumBelow AS sb, tot.n, tot.cap, tot.total
        |  FROM cum, tot
        |  WHERE cum.sumBelow + (tot.n - cum.nBelow) * cum.demand <= tot.cap
        |  ORDER BY cum.demand DESC LIMIT 1),
        |lvl AS (SELECT total, n, cap,
        |    CASE WHEN nb = n THEN vstar
        |      ELSE (cap - sb) // (n - nb) END AS w
        |  FROM star),
        |alloc AS (SELECT dem.user_id, dem.demand,
        |    least(dem.demand, lvl.w) AS alloc,
        |    CAST(dem.demand > lvl.w AS BIGINT) AS capped,
        |    lvl.w AS level, lvl.cap
        |  FROM dem, lvl),
        |sa AS (SELECT CAST(sum(alloc) AS BIGINT) AS s FROM alloc)
        |SELECT a.user_id, a.demand, a.alloc, a.capped, a.level, a.cap,
        |  a.cap - sa.s AS leftover, sa.s <= a.cap AS within_cap
        |FROM alloc a, sa ORDER BY a.user_id""".stripMargin))
  )
}
