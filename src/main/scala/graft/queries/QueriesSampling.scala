package graft.queries

import graft.Tables._
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / packing queries — the
  * reproducible-training-mixture surface (SURVEY §2B north-star rows;
  * reference reproducibility knob at
  * inputs/youtube_audio_extractor.py:47), plus the full-outer-join and
  * unpivot relational gaps.
  */
object QueriesSampling {

  val defs: Seq[QueryDef] = Seq(

    // ---- q81: deterministic train/val/test split --------------------
    QueryDef("q81_hash_split",
      (s, d) => Sampling.hashSplit(documents(s, d), "doc_id", 80, 10)
        .select("doc_id", "split")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        |  CASE WHEN ${DuckSql.hashLong("doc_id")} % 100 < 80 THEN 'train'
        |       WHEN ${DuckSql.hashLong("doc_id")} % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- q82: balanced per-language downsample ----------------------
    QueryDef("q82_balanced_sample",
      (s, d) => Sampling.balancedSample(documents(s, d), "lang", "doc_id", 300)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some(s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1)
        |SELECT doc_id, lang FROM documents JOIN c USING (lang)
        |WHERE ${DuckSql.hashLong("doc_id")} % 10000 <
        |  least(10000, CAST(floor(10000.0 * 300 / cnt) AS BIGINT))
        |ORDER BY doc_id""".stripMargin)),

    // ---- q83: weighted source mixture -------------------------------
    QueryDef("q83_weighted_mix",
      (s, d) => Sampling.weightedMix(documents(s, d), "source", "doc_id",
          Map("wiki" -> 1.0, "news" -> 0.5), 0.25)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_kept FROM documents
        |WHERE ${DuckSql.hashLong("doc_id")} % 10000 <
        |  CASE source WHEN 'wiki' THEN 10000 WHEN 'news' THEN 5000 ELSE 2500 END
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q84: concat-and-chunk sequence packing ---------------------
    QueryDef("q84_pack_sequences",
      (s, d) => Sampling.packSequences(documents(s, d), "doc_id", "n_chars",
          budget = 4096L, nShards = 8)
        .select("doc_id", "shard", "offset", "seq_first", "n_seqs")
        .orderBy("doc_id"),
      Some(s"""WITH s AS (SELECT doc_id, n_chars AS cost,
        |  ${DuckSql.hashLong("doc_id")} % 8 AS shard FROM documents),
        |o AS (SELECT doc_id, cost, shard,
        |  CAST(coalesce(sum(cost) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |  FROM s)
        |SELECT doc_id, shard, "offset", "offset" // 4096 AS seq_first,
        |  (("offset" + greatest(cost, 1) - 1) // 4096) - ("offset" // 4096) + 1 AS n_seqs
        |FROM o ORDER BY doc_id""".stripMargin)),

    // ---- q85: full outer join (both-null-side coalesce) -------------
    QueryDef("q85_full_outer",
      (s, d) => {
        val cust = customer(s, d).where(col("c_acctbal") > 5000)
          .select("c_custkey", "c_name")
        val ords = orders(s, d).groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("sum_price"))
        cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name"), col("n_orders"), col("sum_price"))
          .orderBy("custkey")
      },
      Some("""WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000),
        |o AS (SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders, sum_price
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin)),

    // ---- q86: unpivot (wide metrics -> long) ------------------------
    QueryDef("q86_unpivot",
      (s, d) => lineitem(s, d).groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some("""WITH b AS (SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM b
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM b
        |ORDER BY l_returnflag, metric""".stripMargin))
  )
}
