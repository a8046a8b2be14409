package graft.queries

import graft.Tables._
import graft.ops.Relational._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY §2B): joins, aggregations,
  * windows, sorts, set ops, scalar functions — each with a DuckDB
  * oracle. Conventions for engine-portable, hash-stable results
  * (SURVEY §7.3): money sums via decimal casts then back to double;
  * integer outputs as bigint; explicit ORDER BY with full tie-breaks.
  */
object QueriesRelational {

  /** Analysis happens eagerly at Dataset construction, so the advisory
    * DetectAmbiguousSelfJoin check (false positive on rollup/cube over
    * joins) only needs disabling while the frame is BUILT; restore it
    * immediately so the shared session keeps the check for every other
    * query. */
  private def withoutAmbiguousSelfJoinCheck[A](
      s: org.apache.spark.sql.SparkSession)(build: => A): A = {
    val key = "spark.sql.analyzer.failAmbiguousSelfJoin"
    val prev = s.conf.get(key, "true")
    s.conf.set(key, "false")
    try build finally s.conf.set(key, prev)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: TPC-H Q1-style pricing summary (wide hash-agg) --------
    QueryDef("q01_pricing_summary",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          avgExact(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q02: filter + projection (pushdown check in plan spec) -----
    QueryDef("q02_filter_project",
      (s, d) => lineitem(s, d)
        .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- q03: 3-way join + agg + top-k (customer revenue) -----------
    QueryDef("q03_top_customers",
      (s, d) => {
        val rev = lineitem(s, d).join(orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
        topK(rev, Seq(col("revenue").desc, col("c_custkey").asc), 10)
      },
      Some("""SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin)),

    // ---- q04: broadcast dim joins (customer -> nation -> region) ----
    QueryDef("q04_region_customers",
      (s, d) => customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          avgExact(col("c_acctbal")).as("avg_acctbal"))
        .orderBy("r_name"),
      Some("""SELECT r_name, count(*) AS n_customers,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal), 6) AS avg_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q05: TPC-H Q5-style 6-way join, local-supplier revenue -----
    QueryDef("q05_nation_revenue",
      (s, d) => lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin)),

    // ---- q06: semi join (EXISTS) ------------------------------------
    QueryDef("q06_semi_join",
      (s, d) => semiJoin(customer(s, d),
          orders(s, d).where(col("o_totalprice") > 400000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)),

    // ---- q07: anti join (reference T12 shape, main.py:91-95) --------
    // Parts never shipped in a large quantity — filtered anti join.
    QueryDef("q07_anti_join",
      (s, d) => antiJoin(part(s, d),
          lineitem(s, d).where(col("l_quantity") > 45)
            .select(col("l_partkey").as("p_partkey")),
          Seq("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin)),

    // ---- q08: argmax-per-group window (reference T12, main.py:110) --
    QueryDef("q08_top_order_per_customer",
      (s, d) => topKPerGroup(orders(s, d), Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // ---- q09: running-total + lag window frames ---------------------
    QueryDef("q09_running_total",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d)
          .withColumn("running_spend",
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .where(col("o_custkey") < 10)
          .select("o_custkey", "o_orderkey", "o_totalprice", "running_spend", "prev_price")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
        |  lag(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders WHERE o_custkey < 10 ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- q10: global top-k (TakeOrderedAndProject) ------------------
    QueryDef("q10_topk_lineitems",
      (s, d) => topK(lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("l_extendedprice")),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc), 25),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin)),

    // ---- q11: set operations (INTERSECT / EXCEPT, main.py:91-95) ----
    QueryDef("q11_set_ops",
      (s, d) => {
        val o = orders(s, d)
        val f = o.where(col("o_orderstatus") === "F").select("o_custkey")
        val op = o.where(col("o_orderstatus") === "O").select("o_custkey")
        val p = o.where(col("o_orderstatus") === "P").select("o_custkey")
        f.intersect(op).except(p).orderBy("o_custkey")
      },
      Some("""(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin)),

    // ---- q12: distinct aggregates -----------------------------------
    QueryDef("q12_distinct_agg",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
        |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q13: CASE buckets + arithmetic -----------------------------
    QueryDef("q13_case_buckets",
      (s, d) => lineitem(s, d)
        .withColumn("qty_bucket",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 25, "mid")
            .otherwise("high"))
        .groupBy("l_returnflag", "qty_bucket")
        .agg(count(lit(1)).as("n"),
          sumExact(col("l_quantity")).as("sum_qty"),
          avgExact(col("l_discount"), 2, 6).as("avg_disc"),
          round(max(abs(col("l_tax") - col("l_discount"))), 4).as("max_tax_disc_gap"))
        .orderBy("l_returnflag", "qty_bucket"),
      Some("""SELECT l_returnflag,
        |  CASE WHEN l_quantity < 10 THEN 'low'
        |       WHEN l_quantity < 25 THEN 'mid' ELSE 'high' END AS qty_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
        |  round(max(abs(l_tax - l_discount)), 4) AS max_tax_disc_gap
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q14: string functions --------------------------------------
    QueryDef("q14_string_funcs",
      (s, d) => part(s, d)
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).cast("bigint").as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("bigint").as("brand_num"),
          regexp_replace(lower(col("p_type")), "[aeiou]", "").as("type_novowel"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        |  upper(substring(p_name, 1, 8)) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CAST(nullif(regexp_extract(p_brand, 'Brand#([0-9]+)', 1), '') AS BIGINT) AS brand_num,
        |  regexp_replace(lower(p_type), '[aeiou]', '', 'g') AS type_novowel
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- q15: date truncation + monthly rollup ----------------------
    QueryDef("q15_monthly_revenue",
      (s, d) => orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sumExact(col("o_totalprice")).as("revenue"))
        .orderBy("month"),
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q16: ROLLUP hierarchy --------------------------------------
    // failAmbiguousSelfJoin: rollup's Expand duplicates grouping attrs
    // and trips DetectAmbiguousSelfJoin's false positive (no self join
    // here); the check is advisory, not a correctness rule.
    QueryDef("q16_rollup",
      (s, d) => withoutAmbiguousSelfJoinCheck(s) {
        customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("c_acctbal"))
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n"), sumExact(col("c_acctbal")).as("sum_acctbal"))
        // positional rename: post-rollup name resolution trips Spark's
        // ambiguous-self-join check (Expand duplicates grouping attrs)
        .toDF("r_name", "n_name", "n", "sum_acctbal")
        .na.fill("ALL", Seq("r_name", "n_name"))
        .orderBy("r_name", "n_name")
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin)),

    // ---- q17: CUBE --------------------------------------------------
    QueryDef("q17_cube",
      (s, d) => withoutAmbiguousSelfJoinCheck(s) {
        orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderstatus"), col("o_totalprice"))
        .cube("c_mktsegment", "o_orderstatus")
        .agg(count(lit(1)).as("n"), sumExact(col("o_totalprice")).as("sum_price"))
        .toDF("c_mktsegment", "o_orderstatus", "n", "sum_price")
        .na.fill("ALL", Seq("c_mktsegment", "o_orderstatus"))
        .orderBy("c_mktsegment", "o_orderstatus")
      },
      Some("""SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
        |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus) ORDER BY 1, 2""".stripMargin)),

    // ---- q18: scalar subquery (orders above global average) ---------
    QueryDef("q18_above_avg",
      (s, d) => {
        val o = orders(s, d)
        val thr = o.agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("thr"))
        o.crossJoin(broadcast(thr))
          .where(col("o_totalprice") > col("thr"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_above"),
            sumExact(col("o_totalprice")).as("sum_above"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_above,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_above
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q19: pivot (manual CASE aggregation oracle) ----------------
    QueryDef("q19_pivot_status",
      (s, d) => orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q20: range (non-equi) join against a tiny bucket dim -------
    QueryDef("q20_range_join",
      (s, d) => {
        val buckets = s.createDataFrame(Seq(
          ("small", 1, 17), ("medium", 17, 34), ("large", 34, 51)))
          .toDF("size_class", "lo", "hi")
        part(s, d).join(broadcast(buckets),
            col("p_size") >= col("lo") && col("p_size") < col("hi"))
          .groupBy("size_class")
          .agg(count(lit(1)).as("n_parts"),
            avgExact(col("p_retailprice")).as("avg_price"))
          .orderBy("size_class")
      },
      Some("""SELECT size_class, count(*) AS n_parts,
        |  round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(p_retailprice), 6) AS avg_price
        |FROM part JOIN (VALUES ('small', 1, 17), ('medium', 17, 34), ('large', 34, 51))
        |  AS b(size_class, lo, hi) ON p_size >= lo AND p_size < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin)))
}
