package graft.queries

import graft.Tables._
import graft.ops.Relational
import org.apache.spark.sql.functions._

/** Round-7 nineteenth batch: class-centroid similarity without a
  * cross join, per-day exact quantile trends through one
  * composite-key cum, and the dedup survivor-policy comparison.
  */
object QueriesRound7s {

  val defs: Seq[QueryDef] = Seq(

    // ---- q361: class-centroid similarity matrix ------------------------
    // "Which classes are semantically close" (the readout behind
    // mixture and contrast-set design): per-label SUM vectors from
    // one map-side-combined aggregation over (label, dim) — never
    // doc×doc — then pairwise signed cos² in ppm over the O(labels²)
    // bounded frame: cos²·sign = sign(dot)·dot²·10⁶ div (‖a‖²·‖b‖²),
    // exact integers end to end (sums not means: no division until
    // the final ratio; sqrt never needed).
    QueryDef("q361_centroid_similarity",
      (s, d) => {
        val comp = embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")))
          .select(col("label"), col("pos"),
            expr("cast(round(cast(col as double) * 1000, 0) as bigint)")
              .as("q"))
        val cent = comp.groupBy("label", "pos")
          .agg(sum("q").as("__s"))
        val a = cent.select(col("label").as("label_a"), col("pos"),
          col("__s").as("__sa"))
        val b = cent.select(col("label").as("label_b"), col("pos"),
          col("__s").as("__sb"))
        val dots = a.join(b, Seq("pos"))
          .where(col("label_a") < col("label_b"))
          .groupBy("label_a", "label_b")
          .agg(sum(expr("cast(__sa as decimal(38,0)) * __sb")).as("__dot"))
        val norms = cent.groupBy("label")
          .agg(sum(expr("cast(__s as decimal(38,0)) * __s")).as("__nn"))
        dots
          .join(broadcast(norms.select(col("label").as("label_a"),
            col("__nn").as("__na"))), Seq("label_a"))
          .join(broadcast(norms.select(col("label").as("label_b"),
            col("__nn").as("__nb"))), Seq("label_b"))
          .select(col("label_a"), col("label_b"),
            expr("cast(sign(__dot) as bigint)").as("dot_sign"),
            expr("cast(sign(__dot) * ((__dot * __dot * 1000000)" +
              " div (__na * __nb)) as bigint)").as("cos2_signed_ppm"))
          .orderBy("label_a", "label_b")
      },
      Some("""WITH c AS (SELECT CAST(label AS BIGINT) AS label,
        |    u.i AS pos,
        |    sum(CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000, 0)
        |      AS BIGINT)) AS s
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
        |    u
        |  GROUP BY 1, 2),
        |d AS (SELECT a.label AS la, b.label AS lb,
        |    sum(CAST(a.s AS HUGEINT) * b.s) AS dot
        |  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2),
        |n AS (SELECT label, sum(CAST(s AS HUGEINT) * s) AS nn
        |  FROM c GROUP BY 1)
        |SELECT d.la AS label_a, d.lb AS label_b,
        |  CAST(sign(d.dot) AS BIGINT) AS dot_sign,
        |  CAST(sign(d.dot) * ((d.dot * d.dot * 1000000)
        |    // (na.nn * nb.nn)) AS BIGINT) AS cos2_signed_ppm
        |FROM d JOIN n na ON na.label = d.la
        |JOIN n nb ON nb.label = d.lb
        |ORDER BY label_a, label_b""".stripMargin)),

    // ---- q362: per-day exact quantile trend ----------------------------
    // The latency-SLO dashboard query, exact: P50/P90 of purchase
    // cents PER DAY from ONE composite-key twoLevelCumSum (key =
    // day·2²⁰ + cents — disjoint ranges per day, the q343 trick), so
    // no per-day single-task window and no per-day rescan; per-day
    // totals and prior-day offsets ride a broadcast O(days) frame;
    // the threshold lookup joins day-targets (2 rows/day) against
    // the day's histogram slice with a min fold.
    QueryDef("q362_daily_quantiles",
      (s, d) => {
        val v = events(s, d).where(col("event_type") === "purchase")
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
              .as("v"))
        val hist = v.groupBy("day", "v").agg(count(lit(1)).as("__c"))
          .withColumn("__ck", expr("day * 1048576 + v"))
        val cum = Relational.twoLevelCumSum(hist, "__ck", "__c", 4096L)
        val dt = hist.groupBy("day").agg(sum("__c").as("__nd"))
        val wOff = org.apache.spark.sql.expressions.Window
          .orderBy("day").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val off = broadcast(dt.select(col("day"), col("__nd"),
          coalesce(sum("__nd").over(wOff), lit(0L)).as("__off")))
        val cw = cum.join(off, Seq("day"))
          .select(col("day"), col("v"),
            (col("cum") - col("__off")).as("__cw"))
        val targets = broadcast(off.select(col("day"), col("__nd"),
            expr("(50 * __nd + 99) div 100").as("__p50"),
            expr("(90 * __nd + 99) div 100").as("__p90")))
        cw.join(targets, Seq("day"))
          .groupBy("day", "__nd")
          .agg(min(when(col("__cw") >= col("__p50"), col("v")))
            .as("p50_cents"),
            min(when(col("__cw") >= col("__p90"), col("v")))
              .as("p90_cents"))
          .select(col("day"), col("__nd").as("n_purchases"),
            col("p50_cents"), col("p90_cents"))
          .orderBy("day")
      },
      Some("""WITH v AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT day, v, count(*) AS c FROM v GROUP BY 1, 2),
        |cw AS (SELECT day, v,
        |    sum(c) OVER (PARTITION BY day ORDER BY v) AS cw FROM h),
        |dt AS (SELECT day, count(*) AS nd FROM v GROUP BY 1)
        |SELECT cw.day AS day, CAST(dt.nd AS BIGINT) AS n_purchases,
        |  CAST(min(CASE WHEN cw.cw >= (50 * dt.nd + 99) // 100
        |    THEN cw.v END) AS BIGINT) AS p50_cents,
        |  CAST(min(CASE WHEN cw.cw >= (90 * dt.nd + 99) // 100
        |    THEN cw.v END) AS BIGINT) AS p90_cents
        |FROM cw JOIN dt ON dt.day = cw.day
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // ---- q363: dedup survivor-policy comparison ------------------------
    // Which copy should dedup KEEP? Three policies over the same
    // exact-dup clusters (md5(text) — q40's key) compared in one
    // query: keep-first (min doc_id), keep-longest (max n_chars, id
    // tie-break), keep-max-tokens (distinct-token argmax) — per
    // policy the kept byte mass and its ppm of the corpus. Exact
    // dups share n_chars, so the INTERESTING rows are the near-miss
    // planted variants every corpus carries; the policy deltas are
    // the audit. One cluster agg, three struct-argmax lanes, O(1)
    // output.
    QueryDef("q363_survivor_policy",
      (s, d) => {
        val docs = documents(s, d)
          .select(md5(col("text")).as("__fp"), col("doc_id"),
            col("n_chars"),
            size(array_distinct(graft.ops.Text.tokens(col("text"))))
              .cast("long").as("__tok"))
        // numeric composite argmax keys (identical arithmetic in the
        // oracle — no reliance on either engine's struct ordering):
        // longest: n_chars·2³³ + (2³³ − doc_id)  → max picks longest,
        //          then SMALLEST id; chars recovered as key div 2³³
        // quality: (tok·1024 + n_chars)·2³³ + (2³³ − doc_id); chars =
        //          (key div 2³³) % 4096 (n_chars < 4096, asserted by the 4096 radix)
        val cl = docs.groupBy("__fp")
          .agg(count(lit(1)).as("__n"),
            min("doc_id").as("__first_id"),
            max(expr("n_chars * 8589934592L + (8589934592L - doc_id)"))
              .as("__kl"),
            max(expr("(__tok * 4096 + n_chars) * 8589934592L" +
              " + (8589934592L - doc_id)")).as("__kq"))
        val tot = broadcast(docs.agg(sum("n_chars").as("__t")))
        val byFirst = cl.join(
            docs.select(col("doc_id").as("__first_id"),
              col("n_chars").as("__fc")), Seq("__first_id"))
          .agg(count(lit(1)).as("n_clusters"),
            sum("__fc").as("kept_bytes"))
          .select(lit("keep_first").as("policy"), col("n_clusters"),
            col("kept_bytes"))
        val byLong = cl.agg(count(lit(1)).as("n_clusters"),
            sum(expr("__kl div 8589934592L")).as("kept_bytes"))
          .select(lit("keep_longest").as("policy"), col("n_clusters"),
            col("kept_bytes"))
        val byQual = cl.agg(count(lit(1)).as("n_clusters"),
            sum(expr("(__kq div 8589934592L) % 4096")).as("kept_bytes"))
          .select(lit("keep_max_tokens").as("policy"), col("n_clusters"),
            col("kept_bytes"))
        byFirst.unionByName(byLong).unionByName(byQual)
          .crossJoin(tot)
          .select(col("policy"), col("n_clusters"), col("kept_bytes"),
            expr("(kept_bytes * 1000000) div __t").as("kept_ppm"))
          .orderBy("policy")
      },
      Some(s"""WITH d AS (SELECT md5(text) AS fp, doc_id, n_chars,
        |    len(list_distinct(${DuckSql.toks("text")})) AS tok
        |  FROM documents),
        |cl AS (SELECT fp, count(*) AS n,
        |    min(doc_id) AS first_id,
        |    max(n_chars * 8589934592 + (8589934592 - doc_id))
        |      // 8589934592 AS long_chars,
        |    (max((tok * 4096 + n_chars) * 8589934592
        |      + (8589934592 - doc_id)) // 8589934592) % 4096
        |      AS qual_chars
        |  FROM d GROUP BY 1),
        |t AS (SELECT sum(n_chars) AS t FROM d),
        |f AS (SELECT 'keep_first' AS policy, count(*) AS n_clusters,
        |    sum(d.n_chars) AS kept_bytes
        |  FROM cl JOIN d ON d.doc_id = cl.first_id
        |  UNION ALL
        |  SELECT 'keep_longest', count(*), sum(long_chars) FROM cl
        |  UNION ALL
        |  SELECT 'keep_max_tokens', count(*), sum(qual_chars) FROM cl)
        |SELECT policy, CAST(n_clusters AS BIGINT) AS n_clusters,
        |  CAST(kept_bytes AS BIGINT) AS kept_bytes,
        |  CAST((kept_bytes * 1000000) // t.t AS BIGINT) AS kept_ppm
        |FROM f, t ORDER BY policy""".stripMargin)))
}
