package graft.queries

import graft.Tables._
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Round-7 fourth batch: frequency-domain image fingerprints (DCT
  * pHash — the near-dup hash robust to local edits, next to q218's
  * block aHash) and one-pass integer audio features (ZCR + exact
  * energy sums — the cheap speech/music discriminators next to q216's
  * VAD). Both run the REAL byte-level parsers over deterministically
  * synthesized payloads (the q216/q218 discipline: only the payload is
  * synthetic — offsets, strides, row flips, and chunk walks are the
  * production code path), and both oracles replay the full pixel /
  * closed-form math so a byte-walk bug cannot hash-match.
  */
object QueriesRound7d {

  val defs: Seq[QueryDef] = Seq(

    // ---- q299: DCT perceptual hash (pHash) -----------------------------
    // The frequency-domain member of the image-dedup family: a 32×32
    // gray BMP per part (pixel(x,y) = (7x + 13y + 31·key) % 256), the
    // REAL BMP byte walk, then an ENTIRELY-INTEGER 2-D DCT-II via the
    // fixed-point basis Multimodal.dctQ (cos quantized to 1e4, table
    // embedded literally in the oracle SQL so both engines multiply
    // the same integers), 8×8 low-frequency block, bits thresholded at
    // the lower median — a rank test, so dropped normalization
    // constants cannot flip a bit. Per-row map work only; at corpus
    // scale the hash feeds the q220 banded hamming join unchanged.
    QueryDef("q299_image_phash",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val px = Array.tabulate(1024) { i =>
            val x = i % 32; val y = i / 32
            ((x * 7 + y * 13 + key * 31) % 256).toInt
          }
          Multimodal.makeBmp(32, 32, px)
        }
        part(s, d).where(col("p_partkey") <= 60)
          .select(col("p_partkey"),
            Multimodal.imagePHash(mk(col("p_partkey"))).as("h"))
          .select(col("p_partkey"),
            col("h.hash_hi").as("hash_hi"), col("h.hash_lo").as("hash_lo"),
            col("h.n_set").as("n_set"), col("h.dc").as("dc"),
            col("h.valid").as("valid"))
          .orderBy("p_partkey")
      },
      Some {
        val ct = Multimodal.dctQ.zipWithIndex.map { case (c, i) =>
          s"(${i / 32}, ${i % 32}, $c)"
        }.mkString(", ")
        s"""WITH keys AS (SELECT p_partkey AS key FROM part
        |  WHERE p_partkey <= 60),
        |ax AS (SELECT unnest(generate_series(0, 31)) AS x),
        |px AS (SELECT key, xx.x AS x, yy.x AS y,
        |    CAST(3 * ((xx.x * 7 + yy.x * 13 + key * 31) % 256) AS BIGINT)
        |      AS gray
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
        |  FROM f JOIN med USING (key))
        |SELECT b.key AS p_partkey,
        |  CAST(coalesce(sum(CASE WHEN b = 1 AND i >= 32
        |    THEN CAST(1 AS BIGINT) << (i - 32) END), 0) AS BIGINT)
        |    AS hash_hi,
        |  CAST(coalesce(sum(CASE WHEN b = 1 AND i < 32
        |    THEN CAST(1 AS BIGINT) << i END), 0) AS BIGINT) AS hash_lo,
        |  CAST(sum(b) AS BIGINT) AS n_set,
        |  max(dcv.fv) AS dc, true AS valid
        |FROM bits b JOIN (SELECT key, fv FROM f WHERE u = 0 AND v = 0) dcv
        |  ON dcv.key = b.key
        |GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q303: one-pass integer audio features -------------------------
    // ZCR + exact energy sums over a synthesized square wave whose
    // half-period, length, and amplitude all derive from the key:
    // h = 5 + key%7, n = 400 + 80·(key%5), A = 100 + key%50, sample i
    // = ±A alternating each h frames. Closed forms the oracle replays:
    // zero crossings = (n−1)//h (every block boundary flips sign under
    // the pinned neg/non-neg convention), Σ|s| = n·A, Σs² = n·A².
    // Every 10th key renders a STEREO header — the errors-as-data path
    // (valid=false, zeroed features) rides the same oracle CASE.
    QueryDef("q303_audio_features",
      (s, d) => {
        val mk = udf { (key: Long) =>
          val h = 5 + (key % 7).toInt
          val n = 400 + 80 * (key % 5).toInt
          val a = (100 + key % 50).toShort
          val samples = Array.tabulate[Short](n) { i =>
            if ((i / h) % 2 == 0) a else (-a).toShort
          }
          Multimodal.makeWav(16000, if (key % 10 == 0) 2 else 1, samples)
        }
        part(s, d).where(col("p_partkey") <= 150)
          .select(col("p_partkey"),
            Multimodal.audioFeatureCols(mk(col("p_partkey"))).as("f"))
          .select(col("p_partkey"),
            col("f.n_samples").as("n_samples"),
            col("f.n_zero_cross").as("n_zero_cross"),
            col("f.sum_abs").as("sum_abs"),
            col("f.sum_sq").as("sum_sq"),
            col("f.valid").as("valid"))
          .orderBy("p_partkey")
      },
      Some("""WITH k AS (SELECT p_partkey,
        |    5 + p_partkey % 7 AS h,
        |    CAST(400 + 80 * (p_partkey % 5) AS BIGINT) AS n,
        |    CAST(100 + p_partkey % 50 AS BIGINT) AS a,
        |    p_partkey % 10 = 0 AS stereo
        |  FROM part WHERE p_partkey <= 150)
        |SELECT p_partkey,
        |  CASE WHEN stereo THEN 0 ELSE n END AS n_samples,
        |  CASE WHEN stereo THEN 0 ELSE (n - 1) // h END AS n_zero_cross,
        |  CASE WHEN stereo THEN 0 ELSE n * a END AS sum_abs,
        |  CASE WHEN stereo THEN 0 ELSE n * a * a END AS sum_sq,
        |  NOT stereo AS valid
        |FROM k ORDER BY p_partkey""".stripMargin)))
}
