package graft.queries

import graft.Tables._
import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Round-7 fourteenth batch: equal-frequency feature binning, exact
  * cross-source quantile normalization (both through the two-level
  * cumulative machinery — no single-partition window of the value
  * space), the dedup ROI readout, and a schema-drift detector over
  * two table generations.
  */
object QueriesRound7n {

  val defs: Seq[QueryDef] = Seq(

    // ---- q342: equal-frequency binning ---------------------------------
    // The feature-prep discretizer: 10 equal-frequency bins of price
    // cents. Bin of a VALUE = ((cum − 1)·10) div N over the
    // value-domain histogram cum (q199 twoLevelCumSum — the one
    // global-order window runs over coarse ranges, never values), so
    // equal values always share a bin (ntile would split ties by
    // partition order — not reproducible); bins are equal-frequency
    // up to tie mass. Output per bin: lo/hi edges and count —
    // O(bins) rows from one histogram pass.
    QueryDef("q342_equal_freq_binning",
      (s, d) => {
        val v = lineitem(s, d)
          .select(expr("cast(cast(l_extendedprice as decimal(18,2))" +
            " * 100 as bigint)").as("v"))
        val hist = v.groupBy("v").agg(count(lit(1)).as("__c"))
        val cum = Relational.twoLevelCumSum(hist, "v", "__c", 4096L)
        val tot = broadcast(v.agg(count(lit(1)).as("__n")))
        cum.crossJoin(tot)
          .select(col("v"), col("__c"),
            expr("((cum - __c) * 10) div __n").as("bin"))
          .groupBy("bin")
          .agg(min("v").as("lo"), max("v").as("hi"),
            sum("__c").as("n"))
          .orderBy("bin")
      },
      Some("""WITH v AS (SELECT CAST(CAST(l_extendedprice AS
        |      DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM lineitem),
        |h AS (SELECT v, count(*) AS c FROM v GROUP BY 1),
        |cm AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM h),
        |t AS (SELECT count(*) AS n FROM v)
        |SELECT CAST(((cm.cum - cm.c) * 10) // t.n AS BIGINT) AS bin,
        |  CAST(min(cm.v) AS BIGINT) AS lo,
        |  CAST(max(cm.v) AS BIGINT) AS hi,
        |  CAST(sum(cm.c) AS BIGINT) AS n
        |FROM cm, t GROUP BY 1 ORDER BY bin""".stripMargin)),

    // ---- q343: cross-source quantile normalization ---------------------
    // Batch-effect removal (genomics' quantile normalization, the
    // score-calibration step before cross-source quality gates): a
    // doc's length maps to its WITHIN-SOURCE percentile, then to the
    // POOLED value at that percentile — every source's distribution
    // becomes the pooled one. All exact integers, and NO per-source
    // single-task window: within-source cums ride ONE composite-key
    // twoLevelCumSum (key = src·2048 + value — disjoint ranges per
    // source) minus broadcast per-source starting offsets; the
    // percentile→value map is a 101-row broadcast probe against the
    // pooled histogram. percentile = (cum≤v · 100) div n_src (ties
    // share a percentile — reproducible by construction).
    QueryDef("q343_quantile_normalization",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("source"),
          expr("cast(substring(source, 4) as bigint)").as("__si"),
          col("n_chars"))
        val sv = docs.groupBy("__si", "n_chars")
          .agg(count(lit(1)).as("__c"))
          .withColumn("__ck", expr("__si * 2048 + n_chars"))
        val cum = Relational.twoLevelCumSum(sv, "__ck", "__c", 4096L)
        // per-source totals -> exclusive prefix offsets (O(sources))
        val st = sv.groupBy("__si").agg(sum("__c").as("__ns"))
        val wOff = org.apache.spark.sql.expressions.Window
          .orderBy("__si").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val off = broadcast(st.select(col("__si"), col("__ns"),
          coalesce(sum("__ns").over(wOff), lit(0L)).as("__off")))
        val withPct = cum.join(off, Seq("__si"))
          .select(col("__si"), col("n_chars"),
            expr("((cum - __off) * 100) div __ns").as("pct"))
        // pooled percentile -> value map: 101-row broadcast probe
        val pooled = docs.groupBy("n_chars").agg(count(lit(1)).as("__c"))
        val pcum = Relational.twoLevelCumSum(pooled, "n_chars", "__c",
          4096L)
        val n = broadcast(docs.agg(count(lit(1)).as("__n")))
        val pPct = pcum.crossJoin(n)
          .select(col("n_chars").as("__pv"),
            expr("(cum * 100) div __n").as("__ppct"))
        val grid = broadcast(s.range(0, 101).select(col("id").as("p")))
        val pmap = broadcast(pPct.join(grid, col("__ppct") >= col("p"))
          .groupBy("p").agg(min("__pv").as("norm_chars")))
        docs.join(withPct, Seq("__si", "n_chars"))
          .join(pmap, col("pct") === col("p"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("pct"), col("norm_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, source,
        |    CAST(substr(source, 4) AS BIGINT) AS si, n_chars
        |  FROM documents),
        |sv AS (SELECT si, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
        |cm AS (SELECT si, n_chars,
        |    sum(c) OVER (PARTITION BY si ORDER BY n_chars) AS cw
        |  FROM sv),
        |st AS (SELECT si, sum(c) AS ns FROM sv GROUP BY 1),
        |pc AS (SELECT cm.si, cm.n_chars,
        |    (cm.cw * 100) // st.ns AS pct
        |  FROM cm JOIN st ON cm.si = st.si),
        |pl AS (SELECT n_chars, count(*) AS c FROM d GROUP BY 1),
        |pcm AS (SELECT n_chars,
        |    sum(c) OVER (ORDER BY n_chars) AS cum FROM pl),
        |t AS (SELECT count(*) AS n FROM d),
        |pp AS (SELECT pcm.n_chars AS pv, (pcm.cum * 100) // t.n AS ppct
        |  FROM pcm, t),
        |g AS (SELECT unnest(generate_series(0, 100)) AS p),
        |pm AS (SELECT g.p, min(pp.pv) AS norm_chars FROM g
        |  JOIN pp ON pp.ppct >= g.p GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  CAST(pc.pct AS BIGINT) AS pct,
        |  CAST(pm.norm_chars AS BIGINT) AS norm_chars
        |FROM d JOIN pc ON d.si = pc.si AND d.n_chars = pc.n_chars
        |JOIN pm ON pm.p = pc.pct
        |ORDER BY d.doc_id""".stripMargin)),

    // ---- q344: dedup ROI readout ---------------------------------------
    // What does exact dedup BUY, per source: duplicate clusters by
    // text md5 (q40's key), wasted bytes = cluster chars × (copies−1)
    // (exact dups share n_chars), rolled to per-source totals with
    // the waste share in ppm of source bytes — the number that
    // justifies the dedup stage in a pipeline review. Two
    // map-side-combined aggs; nothing leaves the (source, fp) grain
    // until the O(sources) fold.
    QueryDef("q344_dedup_roi",
      (s, d) => {
        val cl = documents(s, d)
          .select(col("source"), md5(col("text")).as("__fp"),
            col("n_chars"))
          .groupBy("source", "__fp")
          .agg(count(lit(1)).as("__n"), min("n_chars").as("__ch"))
        cl.groupBy("source")
          .agg(sum("__n").as("n_docs"),
            sum(when(col("__n") > 1, col("__n") - 1).otherwise(0L))
              .as("n_dup_docs"),
            sum(col("__n") * col("__ch")).as("total_bytes"),
            sum(when(col("__n") > 1, (col("__n") - 1) * col("__ch"))
              .otherwise(0L)).as("wasted_bytes"))
          .select(col("source"), col("n_docs"), col("n_dup_docs"),
            col("total_bytes"), col("wasted_bytes"),
            expr("(wasted_bytes * 1000000) div total_bytes")
              .as("wasted_ppm"))
          .orderBy("source")
      },
      Some("""WITH cl AS (SELECT source, md5(text) AS fp,
        |    count(*) AS n, min(n_chars) AS ch
        |  FROM documents GROUP BY 1, 2),
        |a AS (SELECT source, sum(n) AS n_docs,
        |    sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS n_dup_docs,
        |    sum(n * ch) AS total_bytes,
        |    sum(CASE WHEN n > 1 THEN (n - 1) * ch ELSE 0 END)
        |      AS wasted_bytes
        |  FROM cl GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
        |  CAST(total_bytes AS BIGINT) AS total_bytes,
        |  CAST(wasted_bytes AS BIGINT) AS wasted_bytes,
        |  CAST((wasted_bytes * 1000000) // total_bytes AS BIGINT)
        |    AS wasted_ppm
        |FROM a ORDER BY source""".stripMargin)),

    // ---- q345: schema drift detector -----------------------------------
    // The contract check between table generations: v1 = documents as
    // written; v2 = the next crawl (planted drift: lang nulled for
    // doc_id ≡ 0 mod 11, n_chars shifted +7 for doc_id ≡ 0 mod 13).
    // Per column: null ppm, distinct count, and (numeric) min/max in
    // BOTH generations plus integer drift deltas — the audit that
    // catches silent producer changes before they poison training
    // mixes. One stats pass per generation (map-side combined), the
    // column axis unpivoted from O(1) aggregates.
    QueryDef("q345_schema_drift",
      (s, d) => {
        val v1 = documents(s, d)
        val v2 = v1.select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null).cast("string"))
            .otherwise(col("lang")).as("lang"),
          col("source"),
          when(col("doc_id") % 13 === 0, col("n_chars") + 7)
            .otherwise(col("n_chars")).as("n_chars"))
        def stats(df: org.apache.spark.sql.DataFrame, g: String) =
          df.agg(
            count(lit(1)).as(s"__n"),
            sum(when(col("lang").isNull, 1L).otherwise(0L)).as("__ln"),
            countDistinct("lang").as("__ld"),
            sum(when(col("source").isNull, 1L).otherwise(0L)).as("__sn"),
            countDistinct("source").as("__sd"),
            sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("__cn"),
            countDistinct("n_chars").as("__cd"),
            min("n_chars").as("__cmin"), max("n_chars").as("__cmax"))
          .select(
            struct(expr("(__ln * 1000000) div __n").as("null_ppm"),
              col("__ld").as("n_distinct"), lit(null).cast("long")
                .as("vmin"), lit(null).cast("long").as("vmax"))
              .as(s"lang_$g"),
            struct(expr("(__sn * 1000000) div __n").as("null_ppm"),
              col("__sd").as("n_distinct"), lit(null).cast("long")
                .as("vmin"), lit(null).cast("long").as("vmax"))
              .as(s"source_$g"),
            struct(expr("(__cn * 1000000) div __n").as("null_ppm"),
              col("__cd").as("n_distinct"), col("__cmin").as("vmin"),
              col("__cmax").as("vmax")).as(s"n_chars_$g"))
        val joined = stats(v1, "v1").crossJoin(stats(v2, "v2"))
        val cols = Seq("lang", "source", "n_chars")
        val rows = cols.map { c =>
          joined.select(lit(c).as("column_name"),
            col(s"${c}_v1.null_ppm").as("null_ppm_v1"),
            col(s"${c}_v2.null_ppm").as("null_ppm_v2"),
            col(s"${c}_v1.n_distinct").as("n_distinct_v1"),
            col(s"${c}_v2.n_distinct").as("n_distinct_v2"),
            col(s"${c}_v1.vmax").as("vmax_v1"),
            col(s"${c}_v2.vmax").as("vmax_v2"),
            (col(s"${c}_v2.null_ppm") =!= col(s"${c}_v1.null_ppm") ||
              col(s"${c}_v2.n_distinct") =!= col(s"${c}_v1.n_distinct") ||
              !(col(s"${c}_v2.vmax") <=> col(s"${c}_v1.vmax")))
              .as("drifted"))
        }
        rows.reduce(_ unionByName _).orderBy("column_name")
      },
      Some("""WITH v2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
        |    source,
        |    CASE WHEN doc_id % 13 = 0 THEN n_chars + 7
        |      ELSE n_chars END AS n_chars
        |  FROM documents),
        |s1 AS (SELECT count(*) AS n,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS ln,
        |    count(DISTINCT lang) AS ld,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS sn,
        |    count(DISTINCT source) AS sd,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS cn,
        |    count(DISTINCT n_chars) AS cd,
        |    min(n_chars) AS cmin, max(n_chars) AS cmax FROM documents),
        |s2 AS (SELECT count(*) AS n,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS ln,
        |    count(DISTINCT lang) AS ld,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS sn,
        |    count(DISTINCT source) AS sd,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS cn,
        |    count(DISTINCT n_chars) AS cd,
        |    min(n_chars) AS cmin, max(n_chars) AS cmax FROM v2),
        |r AS (
        |  SELECT 'lang' AS column_name,
        |    CAST((s1.ln * 1000000) // s1.n AS BIGINT) AS null_ppm_v1,
        |    CAST((s2.ln * 1000000) // s2.n AS BIGINT) AS null_ppm_v2,
        |    CAST(s1.ld AS BIGINT) AS n_distinct_v1,
        |    CAST(s2.ld AS BIGINT) AS n_distinct_v2,
        |    CAST(NULL AS BIGINT) AS vmax_v1,
        |    CAST(NULL AS BIGINT) AS vmax_v2
        |  FROM s1, s2
        |  UNION ALL
        |  SELECT 'source',
        |    CAST((s1.sn * 1000000) // s1.n AS BIGINT),
        |    CAST((s2.sn * 1000000) // s2.n AS BIGINT),
        |    CAST(s1.sd AS BIGINT), CAST(s2.sd AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM s1, s2
        |  UNION ALL
        |  SELECT 'n_chars',
        |    CAST((s1.cn * 1000000) // s1.n AS BIGINT),
        |    CAST((s2.cn * 1000000) // s2.n AS BIGINT),
        |    CAST(s1.cd AS BIGINT), CAST(s2.cd AS BIGINT),
        |    CAST(s1.cmax AS BIGINT), CAST(s2.cmax AS BIGINT)
        |  FROM s1, s2)
        |SELECT column_name, null_ppm_v1, null_ppm_v2,
        |  n_distinct_v1, n_distinct_v2, vmax_v1, vmax_v2,
        |  (null_ppm_v2 != null_ppm_v1
        |    OR n_distinct_v2 != n_distinct_v1
        |    OR NOT (vmax_v2 IS NOT DISTINCT FROM vmax_v1)) AS drifted
        |FROM r ORDER BY column_name""".stripMargin)))
}
