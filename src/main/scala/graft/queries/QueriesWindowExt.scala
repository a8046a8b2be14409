package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family, ordered string aggregation, null-handling
  * scalars, and date arithmetic — each oracle-checked.
  */
object QueriesWindowExt {

  val defs: Seq[QueryDef] = Seq(

    // ---- q75: rank family + distribution functions ------------------
    QueryDef("q75_rank_family",
      (s, d) => {
        // rank/dense_rank/percent_rank give tied rows equal values in
        // both engines, so they keep the bare price order (and still
        // exercise tie semantics); ntile splits tied rows by position,
        // so only IT takes the o_orderkey tie-break for a total order.
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc)
        val wTotal = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .where(col("o_custkey") < 20)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk"),
            round(percent_rank().over(w), 6).as("prnk"),
            ntile(4).over(wTotal).cast("bigint").as("quartile"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  CAST(ntile(4) OVER wt AS BIGINT) AS quartile
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
        |  wt AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- q76: first/last/lead over explicit frames ------------------
    QueryDef("q76_frame_bounds",
      (s, d) => {
        val wOrd = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, d)
          .where(col("o_custkey") < 20)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_totalprice")).over(wFull).as("first_price"),
            last(col("o_totalprice")).over(wFull).as("last_price"),
            lead(col("o_orderkey"), 1).over(wOrd).as("next_orderkey"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_orderkey
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- q77: ordered string aggregation ----------------------------
    QueryDef("q77_string_agg",
      (s, d) => nation(s, d)
        .groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .select(col("n_regionkey").cast("bigint").as("n_regionkey"),
          col("nations"), col("n"))
        .orderBy("n_regionkey"),
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q78: null-handling scalars + date arithmetic ---------------
    QueryDef("q78_null_dates",
      (s, d) => orders(s, d)
        .where(col("o_custkey") < 30)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_non_open"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("(urgent)"))
            .as("prio_or_marker"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp"))
            .cast("bigint").as("days_since_epoch_start"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
            .as("due_date"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_non_open,
        |  coalesce(nullif(o_orderpriority, '1-URGENT'), '(urgent)') AS prio_or_marker,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
        |    AS days_since_epoch_start,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
        |FROM orders WHERE o_custkey < 30 ORDER BY o_orderkey""".stripMargin)),

    // ---- q79: salted skew join (results are salt-transparent, so the
    // oracle is the plain join) ---------------------------------------
    QueryDef("q79_salted_join",
      (s, d) => graft.ops.Relational.saltedJoin(
          lineitem(s, d).select("l_orderkey", "l_quantity"),
          orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
          "l_orderkey", 4, col("l_quantity"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          graft.ops.Relational.sumExact(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q80: map-side-pruned top-k per group (oracle = window SQL,
    // results identical to the un-pruned formulation) -----------------
    QueryDef("q80_topk_per_group_pruned",
      (s, d) => graft.ops.Relational.topKPerGroupLarge(
          orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
          Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin)))
}
