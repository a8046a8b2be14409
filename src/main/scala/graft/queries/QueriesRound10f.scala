package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-10 sixth batch: the curation pipeline as ONE composed query
  * with a stage-by-stage survivor ledger (q563) — the actual 100 TB
  * job the engine exists for, assembled from the verified stage
  * operators — and the shuffle-partition planner that turns ANALYZE
  * stats into the two knobs every Spark job must set (q564).
  */
object QueriesRound10f {

  val defs: Seq[QueryDef] = Seq(

    // ---- q563: curation pipeline ledger ---------------------------------------------
    // Gate → exact dedup → prefix near-dedup → source mixture → pack:
    // five verified stage shapes (q175/q40/q224/q83/q84) COMPOSED, the
    // output being the funnel ledger (rows in/out + drop ppm per
    // stage) plus the final packed-sequence count — the one table a
    // data lead actually reads after a curation run. Every stage is a
    // deterministic function of content (md5 keys, hash-mod quotas),
    // so the oracle replays the whole funnel as chained CTEs and the
    // hash gate pins every stage boundary at once: a single
    // off-by-one anywhere in the composition shifts a ledger row.
    QueryDef("q563_curation_ledger",
      (s, d) => {
        val toks = Text.tokens(col("text"))
        val d0 = documents(s, d).select(col("doc_id"), col("source"),
          col("n_chars"), col("text"), size(toks).as("ntok"),
          concat_ws(" ", slice(toks, 1, 8)).as("prefix8"))
          .repartition(col("doc_id")) // tokenize once (q430/q523 barrier)
        // stage 1: quality gate
        val d1 = d0.where(col("n_chars") >= 100 && col("ntok") >= 20)
        // stage 2: exact dedup (min doc_id survives per md5(text))
        val d2 = d1.withColumn("h", md5(col("text")))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("h")
              .orderBy("doc_id")))
          .where(col("rk") === 1).drop("rk", "h")
        // stage 3: prefix near-dedup (first-8-token fingerprint)
        val d3 = d2.withColumn("p", md5(col("prefix8")))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("p")
              .orderBy("doc_id")))
          .where(col("rk") === 1).drop("rk", "p")
        // stage 4: source mixture (hash-mod rates: wiki 100%, news 50%,
        // rest 25% — the q83 membership function)
        val d4 = d3.where(Sampling.hashLong(col("doc_id")) % 10000 <
          when(col("source") === "wiki", 10000)
            .when(col("source") === "news", 5000).otherwise(2500))
        // stage 5: pack at budget 2048 chars (8 hash shards); the
        // ledger's last row carries sequences, not survivors
        val packed = d4
          .withColumn("shard", Sampling.hashLong(col("doc_id")) % 8)
          .withColumn("off", coalesce(sum(greatest(col("n_chars"), lit(1L)))
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy("shard").orderBy("doc_id")
              .rowsBetween(Long.MinValue, -1)), lit(0L)))
        val nSeq = packed.groupBy("shard")
          .agg(max(expr("(off + greatest(n_chars, 1L) + 2047) div 2048"))
            .as("seqs"))
          .agg(sum("seqs").as("v"))
        def ledger(stage: String, inDf: org.apache.spark.sql.DataFrame,
                   outDf: org.apache.spark.sql.DataFrame) =
          inDf.agg(count(lit(1)).as("rows_in"))
            .crossJoin(outDf.agg(count(lit(1)).as("rows_out")))
            .select(lit(stage).as("stage"), col("rows_in"), col("rows_out"),
              expr("(rows_in - rows_out) * 1000000" +
                " div greatest(rows_in, 1L)").as("drop_ppm"))
        ledger("1_quality_gate", d0, d1)
          .unionAll(ledger("2_exact_dedup", d1, d2))
          .unionAll(ledger("3_prefix_dedup", d2, d3))
          .unionAll(ledger("4_mixture", d3, d4))
          .unionAll(nSeq.select(lit("5_packed_sequences").as("stage"),
            lit(-1L).as("rows_in"), col("v").as("rows_out"),
            lit(-1L).as("drop_ppm")))
          .orderBy("stage")
      },
      Some {
        val hl = DuckSql.hashLong("doc_id")
        s"""WITH d0 AS (SELECT doc_id, source, n_chars, text,
        |    len(${DuckSql.toks("text")}) AS ntok,
        |    array_to_string(${DuckSql.toks("text")}[1:8], ' ') AS prefix8
        |  FROM documents),
        |d1 AS (SELECT * FROM d0 WHERE n_chars >= 100 AND ntok >= 20),
        |d2 AS (SELECT * FROM (SELECT *, row_number() OVER
        |    (PARTITION BY md5(text) ORDER BY doc_id) AS rk FROM d1)
        |  WHERE rk = 1),
        |d3 AS (SELECT * FROM (SELECT doc_id, source, n_chars, prefix8,
        |    row_number() OVER (PARTITION BY md5(prefix8)
        |      ORDER BY doc_id) AS rk FROM d2)
        |  WHERE rk = 1),
        |d4 AS (SELECT * FROM d3 WHERE $hl % 10000 <
        |    CASE source WHEN 'wiki' THEN 10000 WHEN 'news' THEN 5000
        |      ELSE 2500 END),
        |pk AS (SELECT $hl % 8 AS shard,
        |    CAST(coalesce(sum(greatest(n_chars, 1)) OVER
        |      (PARTITION BY $hl % 8 ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS off,
        |    CAST(greatest(n_chars, 1) AS BIGINT) AS cost
        |  FROM d4),
        |ns AS (SELECT CAST(sum(seqs) AS BIGINT) AS v FROM
        |  (SELECT shard, max((off + cost + 2047) // 2048) AS seqs
        |   FROM pk GROUP BY 1)),
        |led AS (
        |  SELECT '1_quality_gate' AS stage,
        |    (SELECT CAST(count(*) AS BIGINT) FROM d0) AS rows_in,
        |    (SELECT CAST(count(*) AS BIGINT) FROM d1) AS rows_out
        |  UNION ALL SELECT '2_exact_dedup',
        |    (SELECT CAST(count(*) AS BIGINT) FROM d1),
        |    (SELECT CAST(count(*) AS BIGINT) FROM d2)
        |  UNION ALL SELECT '3_prefix_dedup',
        |    (SELECT CAST(count(*) AS BIGINT) FROM d2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM d3)
        |  UNION ALL SELECT '4_mixture',
        |    (SELECT CAST(count(*) AS BIGINT) FROM d3),
        |    (SELECT CAST(count(*) AS BIGINT) FROM d4))
        |SELECT stage, rows_in, rows_out,
        |  (rows_in - rows_out) * 1000000 // greatest(rows_in, 1)
        |    AS drop_ppm
        |FROM led
        |UNION ALL SELECT '5_packed_sequences', CAST(-1 AS BIGINT),
        |  (SELECT v FROM ns), CAST(-1 AS BIGINT)
        |ORDER BY stage""".stripMargin
      }),

    // ---- q564: shuffle-partition planner ----------------------------------------------
    // The two knobs every Spark job sets blind —
    // spark.sql.shuffle.partitions and files.maxPartitionBytes — derived
    // from ANALYZE arithmetic instead: per table, measured rows × schema
    // width → estimated bytes, partitions at a 128 MiB target (ceil),
    // and the shuffle-partition recommendation max(2×cores,
    // bytes/target) for a 32-core executor fleet. Planner-grade
    // integer arithmetic both engines share; the lane is the missing
    // LAST column of the q395/q549/q560/q561 ANALYZE story: stats →
    // config, not just stats → plan.
    QueryDef("q564_partition_planner",
      (s, d) => {
        def row(name: String, df: org.apache.spark.sql.DataFrame) = {
          val width = math.max(df.schema.map(_.dataType.defaultSize).sum, 1)
          df.agg(count(lit(1)).as("rows"))
            .select(lit(name).as("tbl"), col("rows"),
              lit(width.toLong).as("row_bytes"),
              expr(s"rows * $width").as("est_bytes"),
              expr(s"greatest(1L, (rows * $width + 134217727)" +
                " div 134217728)").as("scan_partitions_128mb"),
              expr(s"greatest(64L, (rows * $width + 134217727)" +
                " div 134217728)").as("shuffle_partitions_32core"))
        }
        row("lineitem", lineitem(s, d))
          .unionAll(row("orders", orders(s, d)))
          .unionAll(row("documents", documents(s, d)))
          .unionAll(row("events", events(s, d)))
          .orderBy("tbl")
      },
      Some {
        // widths are the Spark schema defaultSize sums, printed from
        // the same source of truth at build time
        def one(name: String, tbl: String, width: Int) =
          s"""SELECT '$name' AS tbl, CAST(count(*) AS BIGINT) AS rows,
             |  CAST($width AS BIGINT) AS row_bytes,
             |  CAST(count(*) AS BIGINT) * $width AS est_bytes,
             |  greatest(1, (CAST(count(*) AS BIGINT) * $width + 134217727)
             |    // 134217728) AS scan_partitions_128mb,
             |  greatest(64, (CAST(count(*) AS BIGINT) * $width + 134217727)
             |    // 134217728) AS shuffle_partitions_32core
             |FROM $tbl""".stripMargin
        // NOTE: widths below must match Spark's defaultSize for the
        // graft.Tables projections; pinned by the hash gate itself.
        s"""SELECT * FROM (
        |${one("documents", "documents", 20 + 20 + 20 + 8 + 8)}
        |UNION ALL ${one("events", "events", 8 + 8 + 8 + 20 + 8 + 20)}
        |UNION ALL ${one("lineitem", "lineitem",
          8 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + 20 + 20 + 8)}
        |UNION ALL ${one("orders", "orders", 8 + 8 + 20 + 8 + 8 + 20)})
        |ORDER BY tbl""".stripMargin
      })
  )
}
