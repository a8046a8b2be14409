package graft.queries

import graft.Tables
import graft.Tables._
import graft.ops.Relational._
import org.apache.spark.sql.functions._

/** Statistical aggregates: dispersion, correlation, exact percentiles,
  * struct-ordered argmax, grouping sets, and the HLL approximate
  * distinct (rows-only — sketch parameters differ across engines; its
  * accuracy bound is asserted in StatsSpec instead).
  */
object QueriesStats {

  val defs: Seq[QueryDef] = Seq(

    // ---- q70: dispersion + correlation ------------------------------
    QueryDef("q70_stats",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_discount"), col("l_tax")), 6).as("covar_disc_tax"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_discount, l_tax), 6) AS covar_disc_tax
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q71: exact percentiles (linear interpolation both engines) -
    QueryDef("q71_percentiles",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(median(col("l_quantity")), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(CAST(median(l_quantity) AS DOUBLE), 4) AS median_qty,
        |  round(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE), 4) AS p25_price,
        |  round(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE), 4) AS p75_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q72: argmax via struct-ordered max (max_by family) ---------
    QueryDef("q72_argmax_struct",
      (s, d) => orders(s, d)
        .groupBy("o_custkey")
        .agg(max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("top_orderkey"),
          max(col("o_totalprice")).as("top_price"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
        |  (max({'p': o_totalprice, 'k': o_orderkey})).k AS top_orderkey,
        |  max(o_totalprice) AS top_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q73: GROUPING SETS (SQL text = oracle text) ----------------
    QueryDef("q73_grouping_sets", {
      val sql = """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY 1, 2""".stripMargin
      (s, d) => {
        Tables.table(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(sql)
      }
    },
      Some("""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY 1, 2""".stripMargin)),

    // ---- q74: HLL approximate distinct (rows-only; bound in tests) --
    QueryDef("q74_approx_distinct",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag"),
      None),

    // ---- q90: approximate percentiles (single-pass quantile sketch —
    // the 100 TB path where exact percentile's full sort/collect is
    // off the table; rows-only, error bound asserted in StatsSpec) ----
    QueryDef("q90_approx_percentile",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(l_extendedprice, array(0.25, 0.75), 1000)")
            .getItem(0).as("ap25"),
          expr("percentile(l_extendedprice, 0.5)").as("exact50"))
        .orderBy("l_returnflag"),
      None))
}
