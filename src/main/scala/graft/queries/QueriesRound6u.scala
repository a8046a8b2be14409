package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-6 twenty-first batch: ingest robustness — corrupt-record
  * quarantine and schema-evolution reads, the two failure modes every
  * long-lived lake hits.
  */
object QueriesRound6u {

  val defs: Seq[QueryDef] = Seq(

    // ---- q287: corrupt-record quarantine -----------------------------
    // Real feeds interleave malformed records with good ones, and a
    // pipeline must ROUTE them (quarantine + count), not die or
    // silently drop. JSONL lines are synthesized from documents —
    // every 7th deliberately truncated mid-object — and parsed with
    // from_json, whose null result IS the corrupt signal (PERMISSIVE
    // semantics as an expression: per-row, no scan options needed, so
    // the same gate runs in batch or streaming). Output: per-source
    // valid/corrupt tallies plus recovered-payload stats over the
    // valid slice only. The oracle replays the parse decision with
    // json_valid.
    QueryDef("q287_corrupt_quarantine",
      (s, d) => {
        val line = when(col("doc_id") % 7 === 0,
            // truncated mid-object: unparseable, deterministically
            concat(lit("{\"id\":"), col("doc_id"), lit(",\"nc\":")))
          .otherwise(concat(lit("{\"id\":"), col("doc_id"),
            lit(",\"nc\":"), col("n_chars"), lit(",\"lang\":\""),
            col("lang"), lit("\"}")))
        documents(s, d)
          .select(col("source"), line.as("raw"))
          .withColumn("parsed", from_json(col("raw"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "id BIGINT, nc BIGINT, lang STRING")))
          // from_json yields a null struct (or null fields) on corrupt
          // input; id is non-null in every well-formed line
          .withColumn("ok", col("parsed.id").isNotNull)
          .groupBy("source")
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("ok"), 1L).otherwise(0L)).as("n_valid"),
            sum(when(!col("ok"), 1L).otherwise(0L)).as("n_corrupt"),
            sum(when(col("ok"), col("parsed.nc"))).as("valid_chars"))
          .orderBy("source")
      },
      Some("""WITH l AS (SELECT source,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN '{"id":' || doc_id || ',"nc":'
        |      ELSE '{"id":' || doc_id || ',"nc":' || n_chars ||
        |        ',"lang":"' || lang || '"}' END AS raw
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN json_valid(raw) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_valid,
        |  CAST(sum(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_corrupt,
        |  CAST(sum(CASE WHEN json_valid(raw)
        |    THEN CAST(json_extract_string(raw, '$.nc') AS BIGINT) END)
        |    AS BIGINT) AS valid_chars
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q288: schema-evolution read (mergeSchema) --------------------
    // A long-lived dataset's files span schema versions: v1 files lack
    // the column v2 added. The lake answer is an evolving read —
    // mergeSchema unions the file schemas and back-fills nulls — not a
    // rewrite of petabytes of v1. Both generations are written inside
    // the query (v1: doc_id/lang; v2: + quality_score), read back as
    // ONE table, and aggregated with explicit null semantics for the
    // pre-evolution rows. The oracle replays the generational union.
    QueryDef("q288_schema_evolution_read",
      (s, d) => {
        val dir = s"${Scratch.dir(s, d)}/q288_docs"
        val base = documents(s, d).select(col("doc_id"), col("lang"))
        base.where(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$dir/gen=v1")
        base.where(col("doc_id") % 2 =!= 0)
          .withColumn("quality_score", col("doc_id") % 100)
          .write.mode("overwrite").parquet(s"$dir/gen=v2")
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("quality_score").isNull, 1L).otherwise(0L))
              .as("n_pre_evolution"),
            sum("quality_score").as("score_sum"))
          .orderBy("lang")
      },
      Some("""WITH u AS (
        |  SELECT doc_id, lang, NULL AS quality_score FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, doc_id % 100 AS quality_score
        |  FROM documents WHERE doc_id % 2 <> 0)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN quality_score IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pre_evolution,
        |  CAST(sum(quality_score) AS BIGINT) AS score_sum
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
