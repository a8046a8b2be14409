package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Relational, Sampling}
import org.apache.spark.sql.functions._

/** Round-6 eighth batch: content-defined chunking (the shift-robust
  * counterpart of q180's fixed segment grid), row-level snapshot
  * diffing for data versioning, and k-fold cross-validation scored by
  * pure reaggregation algebra (train = global − fold, no per-fold
  * rescan). All hash-checked arithmetic is integer.
  */
object QueriesRound6h {

  val defs: Seq[QueryDef] = Seq(

    // ---- q245: content-defined chunk dedup audit ---------------------
    // CDC at token granularity (Dedup.cdcChunkShares): a token opens a
    // new chunk iff its md5-derived value ≡ 0 (mod 8), so boundaries
    // follow content and an insertion re-chunks only its neighborhood
    // — the property fixed grids (q180) lack. Per doc: chunk count,
    // chunks shared verbatim with another doc, share in ppm. Corpus
    // frequency rides md5 fingerprints; chunk text never leaves its
    // doc's rows.
    QueryDef("q245_cdc_chunks",
      (s, d) => Dedup.cdcChunkShares(documents(s, d), "doc_id", "text",
          modBoundary = 8)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS toks
        |    FROM documents),
        |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS p,
        |    toks FROM t WHERE len(toks) > 0),
        |tk AS (SELECT doc_id, p, toks[p] AS tk FROM tok),
        |b AS (SELECT doc_id, p, tk,
        |    CASE WHEN ${DuckSql.hashLong("tk")} % 8 = 0 THEN 1 ELSE 0 END
        |      AS b FROM tk),
        |ch AS (SELECT doc_id, p, tk, sum(b) OVER (PARTITION BY doc_id
        |    ORDER BY p ROWS UNBOUNDED PRECEDING) AS chunk FROM b),
        |ct AS (SELECT doc_id, chunk,
        |    md5(string_agg(tk, ' ' ORDER BY p)) AS fp
        |  FROM ch GROUP BY 1, 2),
        |sh AS (SELECT fp FROM (SELECT fp, count(DISTINCT doc_id) AS m
        |    FROM ct GROUP BY 1) x WHERE m > 1),
        |agg AS (SELECT doc_id, count(*) AS n_chunks,
        |    sum(CASE WHEN fp IN (SELECT fp FROM sh) THEN 1 ELSE 0 END)
        |      AS n_shared
        |  FROM ct GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_chunks, 0) AS BIGINT) AS n_chunks,
        |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
        |  CAST((coalesce(n_shared, 0) * 1000000)
        |    // greatest(coalesce(n_chunks, 0), 1) AS BIGINT) AS shared_ppm
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // ---- q246: snapshot diff (data versioning) -----------------------
    // "What changed between corpus v1 and v2": v2 is a deterministic
    // perturbation of documents (drop / rewrite / add, keyed off an
    // md5 class so both engines build the identical v2), then
    // Relational.snapshotDiff classifies every key off one full-outer
    // join of row FINGERPRINTS (md5 of the payload — wide text never
    // crosses the join). Output: per-class row counts plus the key
    // checksum that pins WHICH rows landed in each class.
    QueryDef("q246_snapshot_diff",
      (s, d) => {
        val cls = Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit("#v2"))) % 37
        val v1 = documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("fp"))
        val base = documents(s, d).withColumn("__c", cls)
        val v2 = base.where(col("__c") =!= 0)
          .select(col("doc_id"),
            md5(when(col("__c") === 1, concat(col("text"), lit(" (rev2)")))
              .otherwise(col("text"))).as("fp"))
          .union(base.where(col("__c") === 2)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              md5(concat(lit("new "), col("text"))).as("fp")))
        Relational.snapshotDiff(v1, v2, "doc_id", "fp")
          .groupBy("diff_class")
          .agg(count(lit(1)).as("n"), sum("doc_id").as("key_sum"))
          .orderBy("diff_class")
      },
      Some(s"""WITH cls AS (SELECT doc_id, text,
        |    ${DuckSql.hashLong("doc_id || '#v2'")} % 37 AS c
        |  FROM documents),
        |v1 AS (SELECT doc_id, md5(text) AS fa FROM documents),
        |v2 AS (SELECT doc_id, md5(CASE WHEN c = 1 THEN text || ' (rev2)'
        |      ELSE text END) AS fb
        |    FROM cls WHERE c <> 0
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id,
        |      md5('new ' || text) AS fb
        |    FROM cls WHERE c = 2),
        |j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS k,
        |    CASE WHEN v1.doc_id IS NULL THEN 'added'
        |      WHEN v2.doc_id IS NULL THEN 'removed'
        |      WHEN fa <> fb THEN 'changed'
        |      ELSE 'unchanged' END AS diff_class
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT diff_class, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS key_sum
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q247: k-fold cross-validation by reaggregation --------------
    // 5-fold CV of the per-language mean-length predictor WITHOUT
    // rescanning the corpus per fold: per-(lang, fold) sums/counts are
    // computed ONCE, and fold f's training mean is (total − fold_f)
    // algebra — the q151/q236 merge discipline run in reverse. Scoring
    // is integer MAE per (lang, fold). Folds are md5-assigned, so both
    // engines agree on membership.
    QueryDef("q247_kfold_cv",
      (s, d) => {
        val f = documents(s, d).select(col("lang"),
          col("n_chars").cast("long").as("v"),
          (Sampling.hashLong(col("doc_id")) % 5).as("fold"))
        val per = f.groupBy("lang", "fold")
          .agg(sum("v").as("fs"), count(lit(1)).as("fc"))
        val tot = per.groupBy("lang")
          .agg(sum("fs").as("ts"), sum("fc").as("tc"))
        val train = per.join(tot, Seq("lang"))
          .select(col("lang"), col("fold"),
            expr("(ts - fs) div greatest(tc - fc, 1)").as("pred"))
        f.join(train, Seq("lang", "fold"))
          .groupBy("lang", "fold")
          .agg(count(lit(1)).as("n_eval"), first("pred").as("pred"),
            sum(abs(col("v") - col("pred"))).as("total_abs_err"))
          .select(col("lang"), col("fold"), col("n_eval"), col("pred"),
            col("total_abs_err"),
            expr("total_abs_err div n_eval").as("mae"))
          .orderBy("lang", "fold")
      },
      Some(s"""WITH f AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
        |    ${DuckSql.hashLong("doc_id")} % 5 AS fold
        |  FROM documents),
        |per AS (SELECT lang, fold, CAST(sum(v) AS BIGINT) AS fs,
        |    CAST(count(*) AS BIGINT) AS fc FROM f GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(fs) AS ts, sum(fc) AS tc
        |  FROM per GROUP BY 1),
        |train AS (SELECT per.lang, per.fold,
        |    CAST((ts - fs) // greatest(tc - fc, 1) AS BIGINT) AS pred
        |  FROM per JOIN tot USING (lang))
        |SELECT f.lang, CAST(f.fold AS BIGINT) AS fold,
        |  CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(any_value(pred) AS BIGINT) AS pred,
        |  CAST(sum(abs(v - pred)) AS BIGINT) AS total_abs_err,
        |  CAST(sum(abs(v - pred)) // count(*) AS BIGINT) AS mae
        |FROM f JOIN train ON f.lang = train.lang AND f.fold = train.fold
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)))
}
