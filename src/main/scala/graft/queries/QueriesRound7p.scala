package graft.queries

import graft.Tables._
import graft.ops.{Multimodal, Text}
import org.apache.spark.sql.functions._

/** Round-7 sixteenth batch: ViT-style image patchify over real BMP
  * bytes, tokenizer INFERENCE (trained BPE merges applied to a
  * held-out split — the production encode path), and the trailing
  * time-RANGE window (the rate-limiter/fraud-velocity frame).
  */
object QueriesRound7p {

  val defs: Seq[QueryDef] = Seq(

    // ---- q350: image patchify (ViT patch stats) ------------------------
    // The multimodal hand-off to a patch-embedding model: 32×32 BMPs
    // (q299's synthesized pixels through the REAL byte walk —
    // bottom-up rows, stride padding) split into 16 8×8 patches, each
    // reduced to exact Σgray/Σgray² plus the derived mean — per-row
    // map work (`Multimodal.patchStats32`), one explode to the
    // (image, patch) grain. The oracle replays pixel synthesis and
    // patch grouping entirely in SQL; the Spark side must parse the
    // actual bytes it made. At corpus scale this is the decode stage
    // of an image curation pipeline: pure narrow ops, no shuffle
    // until the stats aggregate.
    QueryDef("q350_image_patchify",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val px = Array.tabulate(1024) { i =>
            val x = i % 32; val y = i / 32
            ((x * 7 + y * 13 + key * 31) % 256).toInt
          }
          Multimodal.makeBmp(32, 32, px)
        }
        part(s, d).where(col("p_partkey") <= 40)
          .select(col("p_partkey"),
            explode(Multimodal.imagePatchStats(mk(col("p_partkey"))))
              .as("ps"))
          .select(col("p_partkey"), col("ps.patch_id").as("patch_id"),
            col("ps.psum").as("psum"), col("ps.psumsq").as("psumsq"),
            expr("ps.psum div 64").as("pmean"))
          .orderBy("p_partkey", "patch_id")
      },
      Some("""WITH keys AS (SELECT p_partkey AS key FROM part
        |    WHERE p_partkey <= 40),
        |ax AS (SELECT unnest(generate_series(0, 31)) AS x),
        |px AS (SELECT key, xx.x AS x, yy.x AS y,
        |    CAST(3 * ((xx.x * 7 + yy.x * 13 + key * 31) % 256) AS BIGINT)
        |      AS gray
        |  FROM keys, ax xx, ax yy)
        |SELECT key AS p_partkey,
        |  CAST((y // 8) * 4 + (x // 8) AS BIGINT) AS patch_id,
        |  CAST(sum(gray) AS BIGINT) AS psum,
        |  CAST(sum(gray * gray) AS BIGINT) AS psumsq,
        |  CAST(sum(gray) // 64 AS BIGINT) AS pmean
        |FROM px GROUP BY 1, 2 ORDER BY p_partkey, patch_id""".stripMargin)),

    // ---- q351: BPE tokenizer inference on a held-out split -------------
    // q223 TRAINS; this is the production ENCODE path: two merge
    // rounds train on the even-doc split, then the learned merges
    // apply to the held-out odd docs as two broadcast-driven
    // position-indexed rewrites (`Text.mergeAdjacentPair` — a narrow
    // map, exactly how a trained tokenizer deploys). Readout: held-out
    // token counts before/after and the compression in ppm — the
    // generalization check (merges learned on train compress unseen
    // text). Oracle replays training AND application.
    QueryDef("q351_bpe_inference",
      (s, d) => {
        val docs = documents(s, d)
          .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        val train = docs.where(col("doc_id") % 2 === 0)
          .repartition(col("doc_id"))
        val (m1, b1) = Text.bpeMergeRound(train, "toks")
        val (_, b2) = Text.bpeMergeRound(
          m1.repartition(col("doc_id")), "toks")
        val held = docs.where(col("doc_id") % 2 === 1)
          .withColumn("__n0", size(col("toks")).cast("long"))
        val ap1 = held.crossJoin(broadcast(b1.select(
            col("x").as("__x1"), col("y").as("__y1"))))
          .withColumn("toks",
            Text.mergeAdjacentPair(col("toks"), col("__x1"), col("__y1"), "_"))
        val ap2 = ap1.crossJoin(broadcast(b2.select(
            col("x").as("__x2"), col("y").as("__y2"))))
          .withColumn("toks",
            Text.mergeAdjacentPair(col("toks"), col("__x2"), col("__y2"), "_"))
        ap2.agg(count(lit(1)).as("n_docs"),
            sum("__n0").as("tokens_before"),
            sum(size(col("toks")).cast("long")).as("tokens_after"))
          .select(col("n_docs"), col("tokens_before"), col("tokens_after"),
            expr("((tokens_before - tokens_after) * 1000000)" +
              " div tokens_before").as("compression_ppm"))
      },
      Some {
        // the q223 oracle's merge-rewrite form verbatim — the exact
        // mirror of Text.mergeAdjacentPair (strike-on-prev-x has NO
        // cascade guard; "x y y" keeps the trailing y)
        def rewrite(src: String, b: String, out: String) =
          s"""$out AS MATERIALIZED (SELECT doc_id, n0,
          |    list_filter(list_transform(
          |    generate_series(1, len(t)), i ->
          |      CASE WHEN t[i] = $b.x AND i < len(t) AND t[i+1] = $b.y
          |             THEN $b.x || '_' || $b.y
          |           WHEN i > 1 AND t[i-1] = $b.x AND t[i] = $b.y
          |             THEN NULL
          |           ELSE t[i] END), z -> z IS NOT NULL) AS t
          |  FROM $src, $b)"""
        def pairCount(src: String, out: String) =
          s"""$out AS (SELECT string_split(bg, '#')[1] AS x,
          |    string_split(bg, '#')[2] AS y, count(*) AS cnt
          |  FROM (SELECT unnest(list_transform(
          |      generate_series(1, greatest(len(t) - 1, 0)),
          |      i -> t[i] || '#' || t[i+1])) AS bg FROM $src)
          |  WHERE string_split(bg, '#')[1] <> string_split(bg, '#')[2]
          |  GROUP BY 1, 2)"""
        s"""WITH t0 AS (SELECT doc_id, 0 AS n0, ${DuckSql.toks("text")}
        |      AS t FROM documents WHERE doc_id % 2 = 0),
        |${pairCount("t0", "c1")},
        |b1 AS (SELECT x, y FROM c1 ORDER BY cnt DESC, x, y LIMIT 1),
        |${rewrite("t0", "b1", "m1")},
        |${pairCount("m1", "c2")},
        |b2 AS (SELECT x, y FROM c2 ORDER BY cnt DESC, x, y LIMIT 1),
        |h0 AS (SELECT doc_id, len(${DuckSql.toks("text")}) AS n0,
        |    ${DuckSql.toks("text")} AS t
        |  FROM documents WHERE doc_id % 2 = 1),
        |${rewrite("h0", "b1", "h1")},
        |${rewrite("h1", "b2", "h2")}
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n0) AS BIGINT) AS tokens_before,
        |  CAST(sum(len(t)) AS BIGINT) AS tokens_after,
        |  CAST(((sum(n0) - sum(len(t))) * 1000000) // sum(n0) AS BIGINT)
        |    AS compression_ppm
        |FROM h2""".stripMargin
      }),

    // ---- q352: trailing time-RANGE window (velocity features) ----------
    // The rate-limiter / fraud-velocity frame: for every purchase,
    // how many purchases and how many cents did this user commit in
    // the trailing hour INCLUDING this one — a RANGE frame over
    // microsecond time, not a ROWS frame, so simultaneous events are
    // peers regardless of arrival order (reproducible under any
    // partitioning). One per-user window over per-user event counts.
    QueryDef("q352_velocity_window",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-3599999999L, 0)
        events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
              .as("__cents"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            count(lit(1)).over(w).as("n_trailing_1h"),
            sum("__cents").over(w).as("cents_trailing_1h"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id, ts_us,
        |  CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_trailing_1h
        |FROM p
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)))
}
