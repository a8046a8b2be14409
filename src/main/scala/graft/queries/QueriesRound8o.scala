package graft.queries

import graft.Tables._
import graft.ops.{FixedPoint, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 fifteenth batch: ANN hubness audit (q480), the Hill
  * tail-index estimator (q481), and image near-duplicate detection
  * end-to-end — pHash → banded Hamming join → verification (q482).
  */
object QueriesRound8o {

  val defs: Seq[QueryDef] = Seq(

    // ---- q480: ANN hubness audit -----------------------------------------
    // The known ANN pathology the recall numbers alone miss: in high
    // dimensions some points ("hubs") appear in everyone's top-k,
    // degrading retrieval diversity. Over the bounded probe set:
    // exact integer-MIPS top-10 per probe, then k-occurrence per
    // neighbor and its histogram — max k-occurrence far above k·|Q|/N
    // means hub trouble. Rides the verified q306 machinery; output is
    // the O(distinct k-occurrence) frame plus the worst hub.
    QueryDef("q480_ann_hubness",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d).select(col("vec_id"), qv.as("v"))
        val probes = broadcast(emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("v").as("qv")))
        def dotL(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
            (acc, x) => acc + x)
        val wq = Window.partitionBy(col("query_id"))
        val top = emb.crossJoin(probes)
          .where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            dotL(col("v"), col("qv")).as("dot"))
          .withColumn("rn", row_number().over(
            wq.orderBy(col("dot").desc, col("neighbor_id"))))
          .where(col("rn") <= 10)
        val kocc = top.groupBy("neighbor_id")
          .agg(count(lit(1)).as("k_occ"))
        kocc.groupBy("k_occ")
          .agg(count(lit(1)).as("n_vectors"))
          .withColumn("max_k_occ", expr("max(k_occ) OVER ()"))
          .orderBy("k_occ")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |p AS (SELECT vec_id AS query_id, v AS qv FROM e
        |  WHERE vec_id < 20),
        |dt AS (SELECT p.query_id, e.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> e.v[i] * p.qv[i])) AS BIGINT) AS dot
        |  FROM e, p WHERE e.vec_id != p.query_id),
        |rk AS (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS rn FROM dt),
        |ko AS (SELECT neighbor_id, CAST(count(*) AS BIGINT) AS k_occ
        |  FROM rk WHERE rn <= 10 GROUP BY 1)
        |SELECT k_occ, CAST(count(*) AS BIGINT) AS n_vectors,
        |  (SELECT CAST(max(k_occ) AS BIGINT) FROM ko) AS max_k_occ
        |FROM ko GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q481: Hill tail-index estimator -----------------------------------
    // The heavy-tail diagnostic next to the Zipf slope (q427): over
    // per-user event counts, α̂ = (k−1) / Σ_{i<k} ln(x_(i)/x_(k))
    // from the top-k order statistics — α near 1–2 means a power-law
    // activity tail (plan for skew), large α means light tails. Every
    // ln runs through the FixedPoint table on ratios ≥ 1 (order
    // statistics guarantee x_(i) ≥ x_(k)); the top-k pick is
    // TakeOrderedAndProject, the fold a window over 20 rows.
    QueryDef("q481_hill_tail_index",
      (s, d) => {
        val counts = events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("x"))
          .orderBy(col("x").desc, col("user_id").asc)
          .limit(20)
        val xk = counts.agg(min("x").as("xk"), count(lit(1)).as("k"))
        val term = FixedPoint.sparkLnMicroFp20(
          FixedPoint.sparkRatioFp20("(x - xk)", "xk"))
        counts.crossJoin(broadcast(xk))
          .where(col("x") > col("xk"))
          .select(expr(term).as("__ln"), col("xk"), col("k"))
          .groupBy("xk", "k")
          .agg(count(lit(1)).as("n_terms"), sum("__ln").as("sum_ln_micro"))
          .select(col("k"), col("xk").as("x_k"), col("n_terms"),
            col("sum_ln_micro"),
            expr("((k - 1) * 1000000000000) div sum_ln_micro")
              .as("alpha_micro"))
      },
      Some {
        val term = FixedPoint.duckLnMicroFp20(
          FixedPoint.duckRatioFp20("(x - xk)", "xk"))
        s"""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1 ORDER BY x DESC, user_id ASC LIMIT 20),
        |s AS (SELECT CAST(min(x) AS BIGINT) AS xk,
        |    CAST(count(*) AS BIGINT) AS k FROM c),
        |t AS (SELECT $term AS ln_micro, s.xk, s.k FROM c, s
        |  WHERE c.x > s.xk)
        |SELECT k, xk AS x_k, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(ln_micro) AS BIGINT) AS sum_ln_micro,
        |  CAST(((k - 1) * 1000000000000) // sum(ln_micro) AS BIGINT)
        |    AS alpha_micro
        |FROM t GROUP BY k, xk""".stripMargin
      }),

    // ---- q482: image near-dup detection end-to-end ------------------------
    // The pHash fingerprint (q299) composed into the banded-join
    // dedup discipline (q44/q101's SimHash shape): 64-bit perceptual
    // hashes split into four 16-bit bands, candidates = pairs sharing
    // ANY band (an equi-join — never image×image), verification =
    // exact Hamming ≤ 6. Images synthesize in near-dup PAIRS (keys
    // 2j/2j+1 share a base pattern, the odd key carries a ±2-gray
    // perturbation), so the planted pairs must surface. The oracle
    // replays the integer DCT, the banding, and the verification —
    // the whole image-dedup pipeline under one hash gate.
    QueryDef("q482_image_neardup",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val base = key / 2
          val px = Array.tabulate(1024) { i =>
            val x = i % 32; val y = i / 32
            (((x * 7 + y * 13 + base * 31) % 256 +
              (key % 2) * ((x + y) % 3)) % 256).toInt
          }
          Multimodal.makeBmp(32, 32, px)
        }
        val hs = part(s, d).where(col("p_partkey") <= 60)
          .select(col("p_partkey").as("id"),
            Multimodal.imagePHash(mk(col("p_partkey"))).as("h"))
          .select(col("id"), col("h.hash_hi").as("hi"),
            col("h.hash_lo").as("lo"))
        val bands = hs.select(col("id"), col("hi"), col("lo"),
          posexplode(expr("array(lo & 65535, shiftright(lo, 16) & 65535, " +
            "hi & 65535, shiftright(hi, 16) & 65535)"))
            .as(Seq("band", "bval")))
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") &&
              col("a.bval") === col("b.bval") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.hi").as("hi_a"), col("a.lo").as("lo_a"),
            col("b.hi").as("hi_b"), col("b.lo").as("lo_b"))
          .distinct()
          .withColumn("hamming", expr(
            "bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
            .cast("long"))
          .where(col("hamming") <= 6)
          .select(col("id_a"), col("id_b"), col("hamming"))
          .orderBy("id_a", "id_b")
      },
      Some {
        val ct = Multimodal.dctQ.zipWithIndex.map { case (c, i) =>
          s"(${i / 32}, ${i % 32}, $c)"
        }.mkString(", ")
        s"""WITH keys AS (SELECT p_partkey AS key FROM part
        |  WHERE p_partkey <= 60),
        |ax AS (SELECT unnest(generate_series(0, 31)) AS x),
        |px AS (SELECT key, xx.x AS x, yy.x AS y,
        |    CAST(3 * (((xx.x * 7 + yy.x * 13 + (key // 2) * 31) % 256 +
        |      (key % 2) * ((xx.x + yy.x) % 3)) % 256) AS BIGINT) AS gray
        |  FROM keys, ax xx, ax yy),
        |ct(u, x, c) AS (VALUES $ct),
        |f AS (SELECT key, cu.u AS u, cv.u AS v,
        |    CAST(sum(gray * cu.c * cv.c) AS BIGINT) AS fv
        |  FROM px JOIN ct cu ON cu.x = px.x JOIN ct cv ON cv.x = px.y
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT key, fv,
        |    row_number() OVER (PARTITION BY key ORDER BY fv) AS rn FROM f),
        |med AS (SELECT key, fv AS m FROM r WHERE rn = 32),
        |bits AS (SELECT f.key, u * 8 + v AS i,
        |    CASE WHEN fv > m THEN 1 ELSE 0 END AS b
        |  FROM f JOIN med USING (key)),
        |hs AS (SELECT key AS id,
        |    CAST(coalesce(sum(CASE WHEN b = 1 AND i >= 32
        |      THEN CAST(1 AS BIGINT) << (i - 32) END), 0) AS BIGINT) AS hi,
        |    CAST(coalesce(sum(CASE WHEN b = 1 AND i < 32
        |      THEN CAST(1 AS BIGINT) << i END), 0) AS BIGINT) AS lo
        |  FROM bits GROUP BY 1),
        |bands AS (
        |  SELECT id, hi, lo, 0 AS band, lo & 65535 AS bval FROM hs
        |  UNION ALL SELECT id, hi, lo, 1, (lo >> 16) & 65535 FROM hs
        |  UNION ALL SELECT id, hi, lo, 2, hi & 65535 FROM hs
        |  UNION ALL SELECT id, hi, lo, 3, (hi >> 16) & 65535 FROM hs),
        |pr AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
        |  FROM bands a JOIN bands b ON a.band = b.band
        |    AND a.bval = b.bval AND a.id < b.id),
        |hm AS (SELECT id_a, id_b,
        |    CAST(bit_count(CAST(xor(hi_a, hi_b) AS BIGINT))
        |       + bit_count(CAST(xor(lo_a, lo_b) AS BIGINT)) AS BIGINT)
        |      AS hamming
        |  FROM pr)
        |SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 6
        |ORDER BY id_a, id_b""".stripMargin
      })
  )
}
