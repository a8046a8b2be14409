package graft.queries

import graft.Tables
import graft.Tables._
import graft.ops.Relational._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Second relational batch: the SQL string interface, multiset set
  * ops, JSON/map/array functions, date parts, and scalar math — each
  * oracle-checked.
  */
object QueriesRelationalExt {

  val defs: Seq[QueryDef] = Seq(

    // ---- q26: SQL interface (spark.sql over registered views) -------
    // TPC-H Q4 flavor; the ORACLE IS THE SAME TEXT — one SQL dialect
    // parsed by both engines.
    QueryDef("q26_sql_interface", {
      val sql = """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_quantity > 40)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
      (s, d) => {
        Seq("orders", "lineitem").foreach(t =>
          Tables.table(s, d, t).createOrReplaceTempView(t))
        s.sql(sql)
      }
    },
      Some("""SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_quantity > 40)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- q27: multiset set operations (ALL variants) ----------------
    QueryDef("q27_set_ops_all",
      (s, d) => {
        val o = orders(s, d)
        val f = o.where(col("o_orderstatus") === "F").select("o_custkey")
        val p = o.where(col("o_orderstatus") === "P").select("o_custkey")
        f.exceptAll(p).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin)),

    // ---- q28: JSON -> map -> array function chain -------------------
    QueryDef("q28_json_map_keys",
      (s, d) => events(s, d)
        .select(array_join(array_sort(map_keys(
          from_json(col("props"), MapType(StringType, StringType)))), ",").as("prop_keys"))
        .groupBy("prop_keys")
        .agg(count(lit(1)).as("n"))
        .orderBy("prop_keys"),
      Some("""SELECT array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q29: date parts ---------------------------------------------
    QueryDef("q29_date_parts",
      (s, d) => orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("bigint").as("yr"),
          quarter(col("o_orderdate")).cast("bigint").as("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          sumExact(col("o_totalprice")).as("revenue"))
        .orderBy("yr", "qtr"),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q29b: scalar math functions --------------------------------
    QueryDef("q29b_math_funcs",
      (s, d) => lineitem(s, d)
        .where(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          round(abs(col("l_tax") - col("l_discount")), 6).as("tax_disc_gap"),
          signum(col("l_discount") - 0.05).as("disc_sign"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  round(abs(l_tax - l_discount), 6) AS tax_disc_gap,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- q92: changelog (CDC) apply ---------------------------------
    // Fold deterministic upsert/delete changes into the customer
    // snapshot: deletes (key%10=0), balance upserts (key%10=1), a
    // LATER upsert that overrides a delete (key%20=0, seq 2), and
    // brand-new keys (key%10=2, shifted by 1e6). Latest change per key
    // wins; untouched rows pass through.
    QueryDef("q92_apply_changelog",
      (s, d) => {
        val base = customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        val k = col("c_custkey")
        val changes = base.where(k % 10 === 0)
          .select(k, lit("delete").as("op"), lit(1L).as("seq"),
            col("c_name"), col("c_acctbal"))
          .unionAll(base.where(k % 10 === 1)
            .select(k, lit("upsert").as("op"), lit(1L).as("seq"),
              col("c_name"), (col("c_acctbal") + 100).as("c_acctbal")))
          .unionAll(base.where(k % 20 === 0)
            .select(k, lit("upsert").as("op"), lit(2L).as("seq"),
              concat(col("c_name"), lit("_r")).as("c_name"), col("c_acctbal")))
          .unionAll(base.where(k % 10 === 2)
            .select((k + 1000000).as("c_custkey"), lit("upsert").as("op"),
              lit(1L).as("seq"), col("c_name"), col("c_acctbal")))
        graft.ops.Relational.applyChangelog(base, changes,
            "c_custkey", "op", "seq")
          .orderBy("c_custkey")
      },
      Some("""WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |ch AS (
        |  SELECT c_custkey, 'delete' AS op, 1 AS seq, c_name, c_acctbal
        |    FROM base WHERE c_custkey % 10 = 0
        |  UNION ALL SELECT c_custkey, 'upsert', 1, c_name, c_acctbal + 100
        |    FROM base WHERE c_custkey % 10 = 1
        |  UNION ALL SELECT c_custkey, 'upsert', 2, c_name || '_r', c_acctbal
        |    FROM base WHERE c_custkey % 20 = 0
        |  UNION ALL SELECT c_custkey + 1000000, 'upsert', 1, c_name, c_acctbal
        |    FROM base WHERE c_custkey % 10 = 2),
        |latest AS (SELECT * FROM (SELECT ch.*, row_number() OVER
        |  (PARTITION BY c_custkey ORDER BY seq DESC, op DESC) AS rn FROM ch) WHERE rn = 1)
        |SELECT c_custkey,
        |  CASE WHEN l.op = 'upsert' THEN l.c_name ELSE b.c_name END AS c_name,
        |  CASE WHEN l.op = 'upsert' THEN l.c_acctbal ELSE b.c_acctbal END AS c_acctbal
        |FROM base b FULL OUTER JOIN latest l USING (c_custkey)
        |WHERE l.op IS NULL OR l.op != 'delete'
        |ORDER BY c_custkey""".stripMargin)),

    // ---- q93: null-safe equality join (<=> / IS NOT DISTINCT FROM) --
    // plain equality would silently drop the NULL key group
    QueryDef("q93_null_safe_join",
      (s, d) => {
        val o = orders(s, d).select(
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("status_n"))
        val agg = o.groupBy("status_n").agg(count(lit(1)).as("n_status"))
          .withColumnRenamed("status_n", "k")
        o.join(agg, o("status_n") <=> agg("k"))
          .groupBy("status_n", "n_status")
          .agg(count(lit(1)).as("n_rows"))
          .orderBy("status_n")
      },
      Some("""WITH o AS (SELECT nullif(o_orderstatus, 'P') AS status_n FROM orders),
        |a AS (SELECT status_n AS k, count(*) AS n_status FROM o GROUP BY 1)
        |SELECT status_n, n_status, count(*) AS n_rows
        |FROM o JOIN a ON o.status_n IS NOT DISTINCT FROM a.k
        |GROUP BY 1, 2 ORDER BY 1 NULLS FIRST""".stripMargin)),

    // ---- q98: calendar functions (add_months, last_day, day-of-week) -
    QueryDef("q98_calendar",
      (s, d) => orders(s, d)
        .where(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("d_plus_3m"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          // Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6
          dayofweek(col("o_orderdate")).cast("bigint").as("dow"),
          weekofyear(col("o_orderdate")).cast("bigint").as("iso_week"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS d_plus_3m,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  weekofyear(o_orderdate) AS iso_week
        |FROM orders WHERE o_orderkey % 200 = 0
        |ORDER BY o_orderkey""".stripMargin)))
}
