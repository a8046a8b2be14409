package graft.queries

import graft.Tables._
import graft.ops.{Events, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-7 twenty-ninth batch: the ANALYZE-style column-statistics
  * ledger, incremental sessionization proven equal to the global
  * pass, and coordinated key-sampling across a join.
  */
object QueriesRound7ac {

  val defs: Seq[QueryDef] = Seq(

    // ---- q395: column-statistics ledger (ANALYZE TABLE) -----------------
    // The CBO's food, as a first-class query: per column of orders —
    // exact NDV, null ppm, lexicographic/numeric min and max — one
    // ledger row each, every stat a single scan-side fold. Money
    // becomes scale-4 integer units before stringification so both
    // engines print identical bounds (float formatting never crosses
    // the oracle boundary).
    QueryDef("q395_analyze_stats",
      (s, d) => {
        val o = orders(s, d)
          .withColumn("price_u",
            (col("o_totalprice").cast("decimal(18,4)") * 10000)
              .cast("long"))
        def stat(name: String, c: String): DataFrame =
          o.agg(count(lit(1)).as("n_rows"),
            countDistinct(col(c)).as("ndv"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("__nn"),
            min(col(c)).cast("string").as("min_val"),
            max(col(c)).cast("string").as("max_val"))
          .select(lit(name).as("column"), col("n_rows"), col("ndv"),
            expr("(__nn * 1000000) div n_rows").as("null_ppm"),
            col("min_val"), col("max_val"))
        stat("o_custkey", "o_custkey")
          .unionByName(stat("o_orderkey", "o_orderkey"))
          .unionByName(stat("o_orderpriority", "o_orderpriority"))
          .unionByName(stat("o_orderstatus", "o_orderstatus"))
          .unionByName(stat("o_totalprice_u", "price_u"))
          .orderBy("column")
      },
      Some {
        def stat(name: String, c: String) =
          s"""SELECT '$name' AS "column",
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             |  CAST((sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
             |    * 1000000) // count(*) AS BIGINT) AS null_ppm,
             |  CAST(min($c) AS VARCHAR) AS min_val,
             |  CAST(max($c) AS VARCHAR) AS max_val
             |FROM o""".stripMargin
        s"""WITH o AS (SELECT *,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS price_u FROM orders)
        |SELECT * FROM (
        |${stat("o_custkey", "o_custkey")}
        |UNION ALL ${stat("o_orderkey", "o_orderkey")}
        |UNION ALL ${stat("o_orderpriority", "o_orderpriority")}
        |UNION ALL ${stat("o_orderstatus", "o_orderstatus")}
        |UNION ALL ${stat("o_totalprice_u", "price_u")})
        |ORDER BY "column" """.stripMargin
      }),

    // ---- q396: incremental sessionization == the global pass ------------
    // The daily-pipeline shape: two event slices sessionize
    // INDEPENDENTLY, then only the per-user seam state — last session
    // end of slice A, first session start of slice B, both plain
    // per-user MIN/MAX folds because sessions are disjoint ordered
    // intervals — decides whether the boundary sessions bridge
    // (gap ≤ 30 min). The split point is chosen ADVERSARIALLY: the
    // latest intra-session event time (an event within 30 min of its
    // predecessor), so the cut is guaranteed to land inside a live
    // session and the merge path must fire (non-vacuity spec-pinned;
    // any split must give the same answer). The ORACLE is the direct
    // single-pass sessionization, so the hash gate itself proves
    // incremental ≡ global — the equivalence that lets a 100 TB event
    // store sessionize one day at a time.
    QueryDef("q396_incremental_sessions",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("ts"),
          expr("unix_micros(ts)").as("tus"))
        val wu = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("tus")
        val mid = broadcast(ev
          .withColumn("__prev", lag("tus", 1).over(wu))
          .where(col("tus") - col("__prev") <= 1800000000L)
          .agg(coalesce(max("tus"),
            expr("(min(tus) + max(tus)) div 2")).as("mid")))
        val withMid = ev.crossJoin(mid)
        def half(cond: org.apache.spark.sql.Column) =
          Events.sessionStats(
            Events.sessionize(withMid.where(cond)
              .select("user_id", "ts"), "user_id", "ts", 1800),
            "user_id", "ts")
        val a = half(col("tus") < col("mid"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("ca"), sum("duration_us").as("da"),
            max(col("start_us") + col("duration_us")).as("a_end"))
        val b = half(col("tus") >= col("mid"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("cb"), sum("duration_us").as("db"),
            min("start_us").as("b_start"))
        a.join(b, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("ca"), lit(0L)).as("ca"),
            coalesce(col("cb"), lit(0L)).as("cb"),
            coalesce(col("da"), lit(0L)).as("da"),
            coalesce(col("db"), lit(0L)).as("db"),
            (col("a_end").isNotNull && col("b_start").isNotNull &&
              col("b_start") - col("a_end") <= 1800000000L).as("mg"),
            (col("b_start") - col("a_end")).as("gap"))
          .select(col("user_id"),
            (col("ca") + col("cb") - when(col("mg"), 1L).otherwise(0L))
              .as("n_sessions"),
            (col("da") + col("db") + when(col("mg"), col("gap"))
              .otherwise(0L)).as("total_duration_us"))
          .orderBy("user_id")
      },
      Some("""WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, tus, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY tus ROWS UNBOUNDED PRECEDING)
        |    AS sid FROM x),
        |se AS (SELECT user_id, sid, max(tus) - min(tus) AS dur
        |  FROM y GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(dur) AS BIGINT) AS total_duration_us
        |FROM se GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q397: coordinated key-sampling across a join -------------------
    // Sampling a JOIN correctly at 100 TB: sample BOTH sides by the
    // same hash of the join key (1/16 of orderkeys) and the join of
    // samples IS the sample of the join — pushdown identity computed
    // explicitly here (sample-then-join vs join-then-sample, equality
    // as a output column), with the ×16 revenue estimate next to the
    // exact answer and the error in ppm. Independent per-side
    // sampling would square the rate and bias everything — this is
    // the coordinated discipline, measured.
    QueryDef("q397_coordinated_sampling",
      (s, d) => {
        val rev = (col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")
        val li = lineitem(s, d).select(col("l_orderkey"),
          (rev * 10000).cast("long").as("ru"))
        val keep = (c: org.apache.spark.sql.Column) =>
          Sampling.hashLong(concat(c.cast("string"), lit("#cs"))) % 16 === 0
        val joinedAll = li
          .join(orders(s, d).select(col("o_orderkey").as("l_orderkey")),
            Seq("l_orderkey"))
        val exact = joinedAll.agg(count(lit(1)).as("n_exact"),
          sum("ru").as("rev_exact_u"))
        val sampleJoin = li.where(keep(col("l_orderkey")))
          .join(orders(s, d).where(keep(col("o_orderkey")))
            .select(col("o_orderkey").as("l_orderkey")),
            Seq("l_orderkey"))
          .agg(count(lit(1)).as("n_sample"), sum("ru").as("rev_sample_u"))
        val joinSample = joinedAll.where(keep(col("l_orderkey")))
          .agg(count(lit(1)).as("n_js"), sum("ru").as("rev_js_u"))
        exact.crossJoin(broadcast(sampleJoin))
          .crossJoin(broadcast(joinSample))
          .select(col("n_exact"), col("rev_exact_u"),
            col("n_sample"), col("rev_sample_u"),
            (col("rev_sample_u") * 16).as("rev_est_u"),
            expr("(abs(rev_sample_u * 16 - rev_exact_u) * 1000000)" +
              " div rev_exact_u").as("err_ppm"),
            (col("n_sample") === col("n_js") &&
              col("rev_sample_u") === col("rev_js_u"))
              .as("pushdown_match"))
      },
      Some {
        val kl = DuckSql.hashLong("CAST(l_orderkey AS VARCHAR) || '#cs'")
        val ko = DuckSql.hashLong("CAST(o_orderkey AS VARCHAR) || '#cs'")
        s"""WITH li AS (SELECT l_orderkey,
        |    CAST(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ru
        |  FROM lineitem),
        |ja AS (SELECT li.* FROM li JOIN orders
        |  ON o_orderkey = l_orderkey),
        |ex AS (SELECT count(*) AS n_exact, sum(ru) AS rev_exact_u
        |  FROM ja),
        |sj AS (SELECT count(*) AS n_sample, sum(ru) AS rev_sample_u
        |  FROM li JOIN orders ON o_orderkey = l_orderkey
        |  WHERE ($kl) % 16 = 0 AND ($ko) % 16 = 0),
        |js AS (SELECT count(*) AS n_js, sum(ru) AS rev_js_u FROM ja
        |  WHERE ($kl) % 16 = 0)
        |SELECT CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(rev_exact_u AS BIGINT) AS rev_exact_u,
        |  CAST(n_sample AS BIGINT) AS n_sample,
        |  CAST(rev_sample_u AS BIGINT) AS rev_sample_u,
        |  CAST(rev_sample_u * 16 AS BIGINT) AS rev_est_u,
        |  CAST((abs(rev_sample_u * 16 - rev_exact_u) * 1000000)
        |    // rev_exact_u AS BIGINT) AS err_ppm,
        |  n_sample = n_js AND rev_sample_u = rev_js_u AS pushdown_match
        |FROM ex, sj, js""".stripMargin
      }))
}
