package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 seventeenth batch: materializing the training mixture
  * (deterministic fractional upsampling) and the shard-rebalance plan.
  */
object QueriesRound6q {

  val defs: Seq[QueryDef] = Seq(

    // ---- q279: deterministic fractional upsampling -------------------
    // q197 plans epoch repeat factors; this MATERIALIZES them: each
    // source gets a token quota, rate = quota/available can exceed 1,
    // and every document independently receives floor(rate) copies
    // plus one more iff its md5 draw falls under the fractional part —
    // so per-source emitted mass converges to the quota while staying
    // a pure function of (doc_id): any engine, any rerun, any
    // partitioning emits the identical copy list (the q81/q107
    // hash-sampling discipline applied to upsampling). Rates ride a
    // broadcast O(sources) frame; output is the per-doc copy mapping.
    QueryDef("q279_deterministic_upsample",
      (s, d) => {
        val quota = 500000L
        val per = documents(s, d)
          .select(col("source"),
            size(Text.tokens(col("text"))).cast("long").as("__t"))
          .groupBy("source").agg(sum("__t").as("avail"))
          .withColumn("rate_ppm", expr(s"(${quota}L * 1000000) div avail"))
        documents(s, d).select(col("doc_id"), col("source"))
          .join(broadcast(per), "source")
          .select(col("doc_id"), col("source"), col("rate_ppm"),
            (expr("rate_ppm div 1000000") +
              when(Sampling.hashLong(concat(col("doc_id"), lit("#up")))
                % 1000000 < col("rate_ppm") % 1000000, 1L).otherwise(0L))
              .as("n_copies"))
          .orderBy("doc_id")
      },
      Some(s"""WITH per AS (SELECT source,
        |    (CAST(500000 AS BIGINT) * 1000000) // sum(len(${DuckSql.toks("text")}))
        |      AS rate_ppm
        |  FROM documents GROUP BY source)
        |SELECT doc_id, source, CAST(rate_ppm AS BIGINT) AS rate_ppm,
        |  CAST(rate_ppm // 1000000 +
        |    (CASE WHEN ${DuckSql.hashLong("doc_id || '#up'")} % 1000000
        |      < rate_ppm % 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
        |FROM documents JOIN per USING (source)
        |ORDER BY doc_id""".stripMargin)),

    // ---- q280: shard rebalance plan ----------------------------------
    // The ops readout before any 100 TB re-shard: current population
    // per shard vs the largest-remainder ideal target (total div n,
    // +1 for the first total-mod-n shards in stable name order),
    // surplus/deficit, and each shard's role in the move plan. All
    // integer arithmetic on the O(shards) frame — the corpus is
    // touched once for the counts; windows run over shard rows only.
    QueryDef("q280_shard_balance_plan",
      (s, d) => {
        val sizes = documents(s, d).groupBy(col("source").as("shard"))
          .agg(count(lit(1)).as("size"))
        val w = Window.orderBy("shard")
        sizes
          .withColumn("__rank", row_number().over(w))
          .withColumn("__total", sum("size").over())
          .withColumn("__n", count(lit(1)).over())
          .select(col("shard"), col("size"),
            (expr("__total div __n") +
              when(col("__rank") <= expr("__total % __n"), 1L)
                .otherwise(0L)).as("target"))
          .withColumn("surplus", col("size") - col("target"))
          .withColumn("role",
            when(col("surplus") > 0, "give")
              .when(col("surplus") < 0, "take").otherwise("balanced"))
          .orderBy("shard")
      },
      Some("""WITH sz AS (SELECT source AS shard, count(*) AS size
        |  FROM documents GROUP BY 1),
        |t AS (SELECT shard, size,
        |    row_number() OVER (ORDER BY shard) AS rk,
        |    sum(size) OVER () AS total, count(*) OVER () AS n
        |  FROM sz)
        |SELECT shard, CAST(size AS BIGINT) AS size,
        |  CAST(total // n + (CASE WHEN rk <= total % n THEN 1 ELSE 0 END)
        |    AS BIGINT) AS target,
        |  CAST(size - (total // n +
        |    (CASE WHEN rk <= total % n THEN 1 ELSE 0 END)) AS BIGINT)
        |    AS surplus,
        |  CASE WHEN size > total // n +
        |      (CASE WHEN rk <= total % n THEN 1 ELSE 0 END) THEN 'give'
        |    WHEN size < total // n +
        |      (CASE WHEN rk <= total % n THEN 1 ELSE 0 END) THEN 'take'
        |    ELSE 'balanced' END AS role
        |FROM t ORDER BY shard""".stripMargin))
  )
}
