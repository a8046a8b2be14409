package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 seventh batch: watermark tuning from measured lateness
  * (q565) and the per-column index advisor that closes the storage
  * story (q566).
  */
object QueriesRound10g {

  val defs: Seq[QueryDef] = Seq(

    // ---- q565: watermark lateness audit -----------------------------------------------
    // Every streaming lane here picks a watermark; this is the query
    // that says WHICH one the data can afford. Arrival order is the
    // event_id sequence (the synthetic feed's ingest order); an
    // event's lateness is how far the per-type high-water mark of
    // event time had already advanced past it on arrival —
    // max(ts) OVER (arrival order) − ts. The audit reports, per type,
    // how many events a 1/5/15-minute watermark would drop and the
    // worst case — the exact table you read before setting
    // withWatermark. The scan is one ordered window per type
    // (event_type cardinality is fixed, so partitions are bounded; on
    // a 100 TB feed you'd run it per ingest shard, same plan).
    QueryDef("q565_watermark_lateness",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d).select(col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("tsu"))
          .withColumn("late_us", max("tsu").over(w) - col("tsu"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum((col("late_us") > 60000000L).cast("long")).as("drop_1m"),
            sum((col("late_us") > 300000000L).cast("long")).as("drop_5m"),
            sum((col("late_us") > 900000000L).cast("long")).as("drop_15m"),
            max("late_us").as("max_late_us"))
          .withColumn("drop_5m_ppm", expr("drop_5m * 1000000 div n"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, event_id,
        |    epoch_us(ts) AS tsu,
        |    max(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) - epoch_us(ts) AS late_us
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS drop_1m,
        |  CAST(sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS drop_5m,
        |  CAST(sum(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS drop_15m,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us,
        |  CAST(sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
        |    AS drop_5m_ppm
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q566: per-column index advisor ------------------------------------------------
    // The chooser the q541/q551 measurements feed: for each candidate
    // column of a date-clustered orders table, compute NDV and the
    // SCATTER — in how many of the ~80 month-segments the average
    // value appears (distinct (value, segment) pairs div NDV, in
    // centi-segments). Low scatter ⇒ min/max zone maps already prune
    // point lookups; high scatter + high NDV ⇒ pay for a per-segment
    // Bloom; high scatter + low NDV ⇒ nothing prunes, re-cluster.
    // The advice column is the same CASE in both engines, so the
    // decision itself — not just its inputs — is under the hash gate.
    QueryDef("q566_index_advisor",
      (s, d) => {
        val o = orders(s, d).select(
          expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("seg"),
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        val nSegs = o.agg(countDistinct("seg").as("total_segs"))
        def lane(cname: String, c: org.apache.spark.sql.Column) = {
          val pairs = o.select(col("seg"), c.as("v"))
          pairs.agg(countDistinct("v").as("ndv"),
            countDistinct(struct(col("v"), col("seg"))).as("vseg"))
            .crossJoin(nSegs)
            .select(lit(cname).as("column"), col("ndv"), col("total_segs"),
              expr("vseg * 100 div ndv").as("scatter_centisegs"))
        }
        lane("o_custkey", col("o_custkey"))
          .unionAll(lane("o_orderkey", col("o_orderkey")))
          .unionAll(lane("o_orderstatus", col("o_orderstatus")))
          .withColumn("advice",
            expr("CASE WHEN scatter_centisegs <= 200 THEN 'minmax_ok'" +
              " WHEN ndv >= 1000 THEN 'bloom'" +
              " ELSE 'recluster' END"))
          .orderBy("column")
      },
      Some("""WITH o AS (SELECT
        |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS seg,
        |    o_orderkey, o_custkey, o_orderstatus
        |  FROM orders),
        |ts AS (SELECT CAST(count(DISTINCT seg) AS BIGINT) AS total_segs
        |  FROM o),
        |l AS (
        |  SELECT 'o_custkey' AS "column",
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv,
        |    CAST(count(DISTINCT (o_custkey, seg)) AS BIGINT) AS vseg
        |  FROM o
        |  UNION ALL SELECT 'o_orderkey',
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT),
        |    CAST(count(DISTINCT (o_orderkey, seg)) AS BIGINT) FROM o
        |  UNION ALL SELECT 'o_orderstatus',
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |    CAST(count(DISTINCT (o_orderstatus, seg)) AS BIGINT) FROM o)
        |SELECT "column", ndv, total_segs,
        |  vseg * 100 // ndv AS scatter_centisegs,
        |  CASE WHEN vseg * 100 // ndv <= 200 THEN 'minmax_ok'
        |    WHEN ndv >= 1000 THEN 'bloom' ELSE 'recluster' END AS advice
        |FROM l, ts ORDER BY "column"""".stripMargin))
  )
}
