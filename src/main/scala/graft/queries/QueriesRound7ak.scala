package graft.queries

import graft.Tables._
import graft.ops.{Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-7 thirty-seventh batch: the contamination-safe group-aware
  * train/test split.
  */
object QueriesRound7ak {

  val defs: Seq[QueryDef] = Seq(

    // ---- q413: group-aware split vs naive split -------------------------
    // The eval-integrity rule q186 enforces after the fact, built into
    // the SPLIT itself: near-identical docs (here: same 8-token prefix
    // fingerprint — the q224 truncated-recrawl family) must land in
    // the SAME split, or test answers leak into training. The grouped
    // split hashes the CLUSTER key, so zero clusters span by
    // construction — and the query outputs that zero next to how many
    // clusters the naive doc_id hash split WOULD have broken. Split
    // membership stays a pure function of content, so growing the
    // corpus never reshuffles old assignments. One token-prefix scan,
    // two O(clusters) aggregations.
    QueryDef("q413_group_split",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          md5(concat_ws(" ",
            slice(Text.tokens(col("text")), 1, 8))).as("ck"))
        val assigned = docs.select(col("doc_id"), col("ck"),
          (Sampling.hashLong(col("ck")) % 100 < 80).as("grp_train"),
          (Sampling.hashLong(col("doc_id")) % 100 < 80).as("naive_train"))
        val perCluster = assigned.groupBy("ck")
          .agg(count(lit(1)).as("sz"),
            countDistinct(col("grp_train")).as("g_sides"),
            countDistinct(col("naive_train")).as("n_sides"))
        perCluster.agg(
            sum("sz").as("n_docs"), count(lit(1)).as("n_clusters"),
            sum(when(col("sz") > 1, 1L).otherwise(0L))
              .as("n_multi_clusters"),
            sum(when(col("g_sides") > 1, 1L).otherwise(0L))
              .as("spanning_grouped"),
            sum(when(col("n_sides") > 1, 1L).otherwise(0L))
              .as("spanning_naive"))
          .crossJoin(broadcast(assigned.agg(
            sum(when(col("grp_train"), 1L).otherwise(0L)).as("n_train"))))
          .select(col("n_docs"), col("n_clusters"),
            col("n_multi_clusters"), col("spanning_grouped"),
            col("spanning_naive"), col("n_train"),
            expr("(n_train * 1000000) div n_docs").as("train_ppm"))
      },
      Some {
        val hk = DuckSql.hashLong("ck")
        val hd = DuckSql.hashLong("doc_id")
        s"""WITH docs AS (SELECT doc_id,
        |    md5(array_to_string((${DuckSql.toks("text")})[1:8], ' '))
        |      AS ck
        |  FROM documents),
        |a AS (SELECT doc_id, ck, ($hk) % 100 < 80 AS gt,
        |    ($hd) % 100 < 80 AS nt FROM docs),
        |pc AS (SELECT ck, count(*) AS sz,
        |    count(DISTINCT gt) AS gs, count(DISTINCT nt) AS ns
        |  FROM a GROUP BY 1),
        |t AS (SELECT sum(sz) AS n_docs, count(*) AS n_clusters,
        |    sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS n_multi,
        |    sum(CASE WHEN gs > 1 THEN 1 ELSE 0 END) AS sg,
        |    sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS sn
        |  FROM pc),
        |tr AS (SELECT sum(CASE WHEN gt THEN 1 ELSE 0 END) AS n_train
        |  FROM a)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_clusters AS BIGINT) AS n_clusters,
        |  CAST(n_multi AS BIGINT) AS n_multi_clusters,
        |  CAST(sg AS BIGINT) AS spanning_grouped,
        |  CAST(sn AS BIGINT) AS spanning_naive,
        |  CAST(n_train AS BIGINT) AS n_train,
        |  CAST((n_train * 1000000) // n_docs AS BIGINT) AS train_ppm
        |FROM t, tr""".stripMargin
      }))
}
