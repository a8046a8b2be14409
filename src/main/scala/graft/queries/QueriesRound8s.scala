package graft.queries

import graft.Tables._
import graft.ops.Text
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 nineteenth batch: keep-k duplicate survivorship (q489) and
  * exact per-group trimmed means (q490).
  */
object QueriesRound8s {

  val defs: Seq[QueryDef] = Seq(

    // ---- q489: keep-k duplicate survivorship -------------------------------
    // Between "drop all duplicates" (q46/q177) and "keep everything"
    // sits the production policy for valuable repeated content: keep
    // AT MOST k copies per exact-duplicate cluster (dedup-with-cap —
    // repetition is signal up to a point, spam past it). Rank within
    // cluster by (longer text first, then doc_id) and keep rank ≤ 2;
    // per-source ledger of docs kept/dropped and the retained-mass
    // ppm. Clusters come from the md5 fingerprint hash-agg; the only
    // window is per-cluster (bounded by cluster size).
    QueryDef("q489_keep_k_dedup",
      (s, d) => {
        val fp = documents(s, d)
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("len"),
            md5(Text.normText(col("text"))).as("fp"))
        val w = Window.partitionBy("fp")
          .orderBy(col("len").desc, col("doc_id").asc)
        fp.withColumn("__rk", row_number().over(w))
          .withColumn("__keep", (col("__rk") <= 2).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("__keep").as("n_kept"),
            sum(col("len") * col("__keep")).as("kept_chars"),
            sum("len").as("total_chars"))
          .withColumn("dropped", col("n_docs") - col("n_kept"))
          .withColumn("kept_mass_ppm",
            expr("(kept_chars * 1000000) div total_chars"))
          .orderBy("source")
      },
      Some {
        val norm = DuckSql.norm("text")
        s"""WITH fp AS (SELECT doc_id, source,
        |    CAST(n_chars AS BIGINT) AS len, md5($norm) AS fp
        |  FROM documents),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY fp
        |    ORDER BY len DESC, doc_id ASC) AS rk FROM fp),
        |k AS (SELECT source, len,
        |    CASE WHEN rk <= 2 THEN 1 ELSE 0 END AS keep FROM rk)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(keep) AS BIGINT) AS n_kept,
        |  CAST(sum(len * keep) AS BIGINT) AS kept_chars,
        |  CAST(sum(len) AS BIGINT) AS total_chars,
        |  CAST(count(*) - sum(keep) AS BIGINT) AS dropped,
        |  CAST((sum(len * keep) * 1000000) // sum(len) AS BIGINT)
        |    AS kept_mass_ppm
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q490: exact per-group trimmed mean --------------------------------
    // The robust location estimate between the mean (outlier-hostage)
    // and the median (throws away everything): drop the bottom and
    // top 10% BY RANK and average the rest — computed EXACTLY from
    // the per-group value histogram: lo = floor(n/10), hi = n − lo,
    // each distinct value contributes min(cum, hi) − max(cum − c, lo)
    // clamped ≥ 0 occurrences — partial buckets handled by arithmetic,
    // no row explosion, no sort of the corpus. One histogram agg +
    // one per-group window over O(distinct values).
    QueryDef("q490_trimmed_mean",
      (s, d) => {
        val hist = documents(s, d)
          .select(col("lang"), col("n_chars").cast("long").as("v"))
          .groupBy("lang", "v").agg(count(lit(1)).as("c"))
        val wc = Window.partitionBy("lang").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.partitionBy("lang")
        hist
          .withColumn("cum", sum("c").over(wc))
          .withColumn("n", sum("c").over(wAll))
          .withColumn("lo", expr("n div 10"))
          .withColumn("hi", col("n") - col("lo"))
          .withColumn("take", greatest(lit(0L),
            least(col("cum"), col("hi"))
              - greatest(col("cum") - col("c"), col("lo"))))
          .groupBy("lang")
          .agg(max("n").as("n"), sum("take").as("n_used"),
            sum(col("v") * col("take")).as("__s"))
          .select(col("lang"), col("n"), col("n_used"),
            expr("(__s * 1000000) div n_used").as("trimmed_mean_micro"))
          .orderBy("lang")
      },
      Some("""WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |cm AS (SELECT lang, v, c,
        |    sum(c) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |tk AS (SELECT lang, v, c, cum, n, n // 10 AS lo,
        |    n - n // 10 AS hi FROM cm),
        |t2 AS (SELECT lang, v, n,
        |    greatest(0, least(cum, hi) - greatest(cum - c, lo)) AS take
        |  FROM tk)
        |SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(take) AS BIGINT) AS n_used,
        |  CAST((sum(v * take) * 1000000) // sum(take) AS BIGINT)
        |    AS trimmed_mean_micro
        |FROM t2 GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
