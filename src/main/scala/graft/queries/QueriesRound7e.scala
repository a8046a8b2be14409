package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Sampling}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 fifth batch: Poisson-bootstrap confidence intervals (the
  * cluster-scale uncertainty primitive), intra-document repeated-
  * segment removal (the self-repetition scrub next to q180's corpus
  * strike), matryoshka truncation-recall eval (how much top-k survives
  * a 4× dimension cut), and nDCG@10 (the graded ranking-quality metric
  * next to the recall/precision evals). Every float constant any of
  * these need (Poisson CDF, 1/log₂ discounts) is quantized ONCE in
  * Scala from StrictMath and embedded literally in both engines — the
  * dctQ discipline, so all runtime arithmetic is integer.
  */
object QueriesRound7e {

  /** floor(P(Poisson(1) ≤ j)·2³²) for j = 0..6 — the inverse-CDF
    * thresholds for the deterministic Poisson(1) draw (weights capped
    * at 7; P(X > 7) ≈ 1e-5 — the truncation is part of the pinned
    * definition, identically in both engines). */
  private val poissonCdf32: Seq[Long] = {
    var term = StrictMath.exp(-1.0); var acc = 0.0
    (0 to 6).map { j =>
      if (j > 0) term /= j
      acc += term
      math.floor(acc * 4294967296.0).toLong
    }
  }

  /** round(10⁶ / log₂(i+1)) for ranks i = 1..10 — the nDCG discount
    * table, micro-quantized. */
  private val ilogMicro: Seq[Long] = (1 to 10).map(i =>
    math.round(1000000.0 / (StrictMath.log(i + 1.0) / StrictMath.log(2.0))))

  /** Prefix sums of [[ilogMicro]] (ideal-DCG numerators). */
  private val ilogPrefix: Seq[Long] = ilogMicro.scanLeft(0L)(_ + _).tail

  val defs: Seq[QueryDef] = Seq(

    // ---- q304: Poisson-bootstrap confidence interval -------------------
    // The bootstrap that actually runs on clusters (each row draws an
    // independent Poisson(1) weight per replicate — no global resample
    // pass, map-side-combinable): B=64 replicates of mean(n_chars),
    // weights from md5-derived uniforms through the embedded CDF
    // thresholds, replicate means in exact micro units, CI = the
    // 2nd/63rd order statistics (≈ the 95% percentile interval). The
    // only window runs over the 64-row replicate frame. Explode cost
    // is 64× the corpus — one map-side pass feeding a 64-group
    // partial-combining aggregation, no shuffle of row data.
    QueryDef("q304_poisson_bootstrap_ci",
      (s, d) => {
        val b = 64
        val u = Sampling.hashLong(concat(col("doc_id").cast("string"),
          lit("#boot"), col("__b").cast("string")))
        val w = poissonCdf32.map(t =>
          when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
        val reps = documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            explode(sequence(lit(0), lit(b - 1))).as("__b"))
          .select(col("__b"), col("n_chars"), w.as("__w"))
          .groupBy("__b")
          .agg(sum("__w").as("__sw"),
            sum(col("__w") * col("n_chars")).as("__sx"))
          .select(col("__b"),
            expr("(__sx * 1000000) div greatest(__sw, 1)").as("__m"))
          // rank window over the B-row replicate frame only
          .withColumn("__rn", row_number().over(
            Window.orderBy(col("__m"), col("__b"))))
        val lo = reps.where(col("__rn") === 2)
          .select(col("__m").as("lo_micro"))
        val hi = reps.where(col("__rn") === b - 1)
          .select(col("__m").as("hi_micro"))
        val point = documents(s, d)
          .agg(count(lit(1)).as("n_docs"),
            expr("(sum(n_chars) * 1000000) div count(1)").as("point_micro"))
        point.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
          .select(col("n_docs"), col("point_micro"),
            lit(b.toLong).as("n_replicates"),
            col("lo_micro"), col("hi_micro"))
      },
      Some {
        val u = DuckSql.hashLong(
          "CAST(doc_id AS VARCHAR) || '#boot' || CAST(b AS VARCHAR)")
        val w = poissonCdf32.map(t =>
          s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH bs AS (SELECT unnest(generate_series(0, 63)) AS b),
        |rows0 AS (SELECT doc_id, n_chars, b, $w AS w
        |  FROM documents, bs),
        |reps AS (SELECT b, (sum(w * n_chars) * 1000000)
        |    // greatest(sum(w), 1) AS m FROM rows0 GROUP BY 1),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM reps),
        |pt AS (SELECT count(*) AS n_docs,
        |    (sum(n_chars) * 1000000) // count(*) AS point_micro
        |  FROM documents)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(point_micro AS BIGINT) AS point_micro,
        |  CAST(64 AS BIGINT) AS n_replicates,
        |  CAST((SELECT m FROM rk WHERE rn = 2) AS BIGINT) AS lo_micro,
        |  CAST((SELECT m FROM rk WHERE rn = 63) AS BIGINT) AS hi_micro
        |FROM pt""".stripMargin
      }),

    // ---- q305: intra-document repeated-segment removal -----------------
    // The self-repetition scrub: on the q180 8-token grid, occurrences
    // of a segment AFTER its first within the SAME doc are struck and
    // the remainder reassembled in order. No corpus frequency pass —
    // the decision is a per-(doc, fingerprint) min-position window, so
    // the whole operator is one doc-keyed shuffle.
    QueryDef("q305_intra_doc_dedup",
      (s, d) => Dedup.intraDocSegmentDedup(documents(s, d), "doc_id",
          "text", segTokens = 8)
        .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS toks
        |    FROM documents),
        |st AS (SELECT doc_id, unnest(generate_series(1, len(toks), 8)) AS s,
        |    toks FROM t WHERE len(toks) > 0),
        |seg AS (SELECT doc_id, s, array_to_string(toks[s:s+7], ' ') AS seg
        |    FROM st),
        |fp AS (SELECT doc_id, s, seg, md5(seg) AS fp,
        |    min(s) OVER (PARTITION BY doc_id, md5(seg)) AS firsts
        |  FROM seg),
        |kept AS (SELECT * FROM fp WHERE s = firsts),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(seg, ' ' ORDER BY s) AS clean FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_segs FROM fp GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(tot.n_segs, 0) AS BIGINT) AS n_segs,
        |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(coalesce(tot.n_segs, 0) - coalesce(reb.n_kept, 0) AS BIGINT)
        |    AS n_dropped,
        |  md5(coalesce(reb.clean, '')) AS clean_md5
        |FROM documents d LEFT JOIN tot USING (doc_id)
        |LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ---- q306: matryoshka truncation-recall eval -----------------------
    // Matryoshka embeddings promise that a prefix of the vector is
    // itself a usable embedding; this measures what that costs HERE:
    // top-10 MIPS neighbors by the full 64-dim integer dot vs by the
    // 16-dim prefix dot, per-query overlap in the two top-10 sets.
    // The measured-eval discipline (q262/q268/q272): both pipelines
    // run and the measurement itself is hash-verified. Dots are
    // millis-quantized BIGINTs (the q254/q277 convention); windows
    // partition per query; the probe set is bounded and broadcast.
    QueryDef("q306_matryoshka_recall",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d).select(col("vec_id"), qv.as("v"))
        val probes = broadcast(emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("v").as("qv")))
        def dot(a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column) =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
            (acc, x) => acc + x)
        val wq = Window.partitionBy(col("query_id"))
        emb.crossJoin(probes).where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            dot(col("v"), col("qv")).as("dot_full"),
            dot(slice(col("v"), 1, 16), slice(col("qv"), 1, 16))
              .as("dot_trunc"))
          .withColumn("rn_full", row_number().over(
            wq.orderBy(col("dot_full").desc, col("neighbor_id"))))
          .withColumn("rn_trunc", row_number().over(
            wq.orderBy(col("dot_trunc").desc, col("neighbor_id"))))
          .groupBy("query_id")
          .agg(sum(when(col("rn_full") <= 10 && col("rn_trunc") <= 10, 1L)
            .otherwise(0L)).as("n_overlap"))
          .withColumn("recall_ppm",
            expr("(n_overlap * 1000000) div 10"))
          .orderBy("query_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
        |dots AS (SELECT p.query_id, e.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> e.v[i] * p.qv[i])) AS BIGINT) AS dot_full,
        |    CAST(list_sum(list_transform(generate_series(1, 16),
        |      i -> e.v[i] * p.qv[i])) AS BIGINT) AS dot_trunc
        |  FROM e, p WHERE e.vec_id != p.query_id),
        |rk AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot_full DESC, neighbor_id) AS rn_full,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot_trunc DESC, neighbor_id) AS rn_trunc
        |  FROM dots)
        |SELECT query_id,
        |  CAST(sum(CASE WHEN rn_full <= 10 AND rn_trunc <= 10
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |  CAST((sum(CASE WHEN rn_full <= 10 AND rn_trunc <= 10
        |    THEN 1 ELSE 0 END) * 1000000) // 10 AS BIGINT) AS recall_ppm
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q307: nDCG@10 of MIPS retrieval by label agreement ------------
    // The graded ranking-quality metric: system ranking = full-dim
    // integer MIPS top-10 (the q306 machinery), relevance = label
    // agreement with the query (gain 2³−1 = 7, else 0), discounts from
    // the embedded micro 1/log₂ table, ideal DCG from its prefix sums
    // over min(10, #relevant-in-corpus). dcg/idcg/ndcg all exact
    // integers; the per-label corpus counts come from one O(labels)
    // aggregation broadcast back.
    QueryDef("q307_ndcg_at_10",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d).select(col("vec_id"),
          col("label").cast("long").as("label"), qv.as("v"))
        val probes = broadcast(emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"),
            col("label").as("qlabel"), col("v").as("qv")))
        val labelCounts = emb.groupBy("label")
          .agg(count(lit(1)).as("__lc"))
        val ilogArr = array(ilogMicro.map(lit): _*)
        val prefArr = array(ilogPrefix.map(lit): _*)
        val wq = Window.partitionBy(col("query_id"))
        emb.crossJoin(probes).where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qlabel"),
            col("vec_id").as("neighbor_id"), col("label"),
            aggregate(zip_with(col("v"), col("qv"), (x, y) => x * y),
              lit(0L), (acc, x) => acc + x).as("dot"))
          .withColumn("rn", row_number().over(
            wq.orderBy(col("dot").desc, col("neighbor_id"))))
          .where(col("rn") <= 10)
          .groupBy("query_id", "qlabel")
          .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L))
            .as("n_rel10"),
            sum(when(col("label") === col("qlabel"),
              lit(7L) * element_at(ilogArr, col("rn")))
              .otherwise(0L)).as("dcg_micro"))
          .join(broadcast(labelCounts.withColumnRenamed("label", "qlabel")),
            Seq("qlabel"))
          .withColumn("idcg_micro",
            lit(7L) * element_at(prefArr,
              least(col("__lc") - 1, lit(10L)).cast("int")))
          .select(col("query_id"), col("n_rel10"), col("dcg_micro"),
            col("idcg_micro"),
            expr("(dcg_micro * 1000000) div idcg_micro").as("ndcg_ppm"))
          .orderBy("query_id")
      },
      Some {
        val ilogList = ilogMicro.mkString("list_value(", ", ", ")")
        val prefList = ilogPrefix.mkString("list_value(", ", ", ")")
        s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
        |  FROM e WHERE vec_id < 20),
        |lc AS (SELECT label, count(*) AS n FROM e GROUP BY 1),
        |dots AS (SELECT p.query_id, p.qlabel, e.vec_id AS neighbor_id,
        |    e.label,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> e.v[i] * p.qv[i])) AS BIGINT) AS dot
        |  FROM e, p WHERE e.vec_id != p.query_id),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id) AS rn FROM dots),
        |agg AS (SELECT query_id, qlabel,
        |    CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_rel10,
        |    CAST(sum(CASE WHEN label = qlabel
        |      THEN 7 * ($ilogList)[rn] ELSE 0 END) AS BIGINT) AS dcg_micro
        |  FROM rk WHERE rn <= 10 GROUP BY 1, 2)
        |SELECT a.query_id, a.n_rel10, a.dcg_micro,
        |  CAST(7 * ($prefList)[CAST(least(lc.n - 1, 10) AS INT)] AS BIGINT)
        |    AS idcg_micro,
        |  CAST((a.dcg_micro * 1000000)
        |    // (7 * ($prefList)[CAST(least(lc.n - 1, 10) AS INT)])
        |    AS BIGINT) AS ndcg_ppm
        |FROM agg a JOIN lc ON lc.label = a.qlabel
        |ORDER BY a.query_id""".stripMargin
      }))
}
