package graft.queries

import graft.Tables._
import graft.ops.{Classify, Eval, FixedPoint, Sampling, Sketches, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 eighth batch: quantization/sketch/calibration/model-audit
  * operators — binary-sign embedding quantization with measured
  * recall (q446), a HyperLogLog distinct sketch with measured error
  * and the register merge law (q447), isotonic calibration via
  * pool-adjacent-violators (q448), a batch-perceptron trained linear
  * classifier with a chained-round oracle (q449), and a functional-
  * dependency discovery ledger (q450). All exact-integer
  * formulations under the hash gate.
  */
object QueriesRound8h {

  /** One FD-candidate ledger row: groupBy(lhs, rhs) counts → per-lhs
    * rollup → (rows, lhs values, violating lhs values, g3 error).
    * One shuffle per candidate, output one row — never a row-level
    * pairing. g3 is the classic approximate-FD error: the fraction
    * of rows that must be deleted for the FD to hold exactly
    * (rows − Σ_lhs max rhs-group count). */
  private def fdRow(df: DataFrame, tbl: String, lhs: String, rhs: String,
                    l: Column, r: Column): DataFrame =
    df.select(l.cast("string").as("__l"), r.cast("string").as("__r"))
      .groupBy("__l", "__r").agg(count(lit(1)).as("__c"))
      .groupBy("__l").agg(sum("__c").as("__n"), count(lit(1)).as("__k"),
        max("__c").as("__mx"))
      .agg(sum("__n").as("n_rows"), count(lit(1)).as("n_lhs"),
        sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_violating"),
        sum("__mx").as("__keep"))
      .select(lit(tbl).as("tbl"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
        col("n_rows"), col("n_lhs"), col("n_violating"),
        (col("n_violating") === 0).as("holds"),
        expr("((n_rows - __keep) * 1000000) div n_rows").as("g3_ppm"))

  private def duckFd(tbl: String, lhs: String, rhs: String,
                     lExpr: String, rExpr: String): String =
    s"""SELECT '$tbl' AS tbl, '$lhs' AS lhs, '$rhs' AS rhs,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_lhs,
       |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violating,
       |  sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds,
       |  CAST(((sum(n) - sum(mx)) * 1000000) // sum(n) AS BIGINT) AS g3_ppm
       |FROM (SELECT l, sum(c) AS n, count(*) AS k, max(c) AS mx FROM
       |  (SELECT CAST($lExpr AS VARCHAR) AS l, CAST($rExpr AS VARCHAR) AS r,
       |     count(*) AS c FROM $tbl GROUP BY 1, 2) GROUP BY 1)""".stripMargin

  

  val defs: Seq[QueryDef] = Seq(

    // ---- q446: binary-sign quantization ANN (Hamming) ------------------
    // The 1-bit quantization tier under SQ8 (q147) and PQ (q297): each
    // 64-dim embedding collapses to ONE 64-bit signature (sign bit per
    // dimension, packed as two 32-bit halves so neither engine touches
    // the BIGINT sign bit), and candidate scoring is
    // bit_count(xor(...)) — a 64× memory-bandwidth cut over float
    // dots, the coarsest cascade stage before SQ8/PQ rerank. The
    // measured-eval discipline (q306): Hamming top-10 vs exact integer
    // MIPS top-10, per-probe overlap hash-verified. Probes bounded and
    // broadcast; corpus streamed once; signatures are a pure
    // projection (at 100 TB the signature table is what you persist).
    QueryDef("q446_binary_quant_recall",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val emb = embeddings(s, d).select(col("vec_id"), qv.as("v"))
          .withColumn("lo", expr(graft.ops.Similarity.signPackLoSql))
          .withColumn("hi", expr(graft.ops.Similarity.signPackHiSql))
        val probes = broadcast(emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("lo").as("qlo"), col("hi").as("qhi")))
        def dotL(a: Column, b: Column) =
          aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
            (acc, x) => acc + x)
        val wq = Window.partitionBy(col("query_id"))
        emb.crossJoin(probes).where(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            dotL(col("v"), col("qv")).as("dot_full"),
            expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)")
              .cast("long").as("hamming"))
          .withColumn("rn_exact", row_number().over(
            wq.orderBy(col("dot_full").desc, col("neighbor_id"))))
          .withColumn("rn_ham", row_number().over(
            wq.orderBy(col("hamming").asc, col("neighbor_id"))))
          .groupBy("query_id")
          .agg(sum(when(col("rn_exact") <= 10 && col("rn_ham") <= 10, 1L)
            .otherwise(0L)).as("n_overlap"),
            min(when(col("rn_ham") === 1, col("hamming")))
              .as("best_hamming"))
          .withColumn("recall_ppm", expr("(n_overlap * 1000000) div 10"))
          .orderBy("query_id")
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |sg AS (SELECT vec_id, v,
        |    CAST(list_sum(list_transform(generate_series(1, 32),
        |      i -> CASE WHEN v[i] >= 0 THEN 1::BIGINT << (i - 1)
        |           ELSE 0 END)) AS BIGINT) AS lo,
        |    CAST(list_sum(list_transform(generate_series(33, 64),
        |      i -> CASE WHEN v[i] >= 0 THEN 1::BIGINT << (i - 33)
        |           ELSE 0 END)) AS BIGINT) AS hi
        |  FROM e),
        |p AS (SELECT vec_id AS query_id, v AS qv, lo AS qlo, hi AS qhi
        |  FROM sg WHERE vec_id < 20),
        |dt AS (SELECT p.query_id, sg.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> sg.v[i] * p.qv[i])) AS BIGINT) AS dot_full,
        |    CAST(bit_count(CAST(xor(sg.lo, p.qlo) AS BIGINT))
        |       + bit_count(CAST(xor(sg.hi, p.qhi) AS BIGINT)) AS BIGINT)
        |      AS hamming
        |  FROM sg, p WHERE sg.vec_id != p.query_id),
        |rk AS (SELECT query_id, neighbor_id, hamming,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot_full DESC, neighbor_id) AS rn_exact,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY hamming ASC, neighbor_id) AS rn_ham
        |  FROM dt)
        |SELECT query_id,
        |  CAST(sum(CASE WHEN rn_exact <= 10 AND rn_ham <= 10
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |  CAST(min(CASE WHEN rn_ham = 1 THEN hamming END) AS BIGINT)
        |    AS best_hamming,
        |  CAST((sum(CASE WHEN rn_exact <= 10 AND rn_ham <= 10
        |    THEN 1 ELSE 0 END) * 1000000) // 10 AS BIGINT) AS recall_ppm
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q447: HyperLogLog distinct sketch, measured ------------------
    // The industry-standard distinct counter next to the engine's KMV
    // (q74/q414): 64 registers per source, register j = max leading-
    // zero rank of the 26 hash bits below the 6 bucket bits, estimate
    // α·m²/Σ2^(−M[j]) carried as exact integers (the harmonic
    // denominator scaled by 2⁴⁰, one α literal shared by both
    // engines), linear-counting fallback through the FixedPoint table
    // ln when zero registers exist. Three laws ride the same query:
    // the measured error vs the exact distinct count, and the
    // register merge law (max of hash-parity half-sketches == full
    // sketch, the property that makes HLL maintenance incremental —
    // the q440 discipline). Shuffle shape: one token explode → one
    // map-side-combining (source, bucket) max-agg → O(sources × 64)
    // frame; registers are 6 bits each at any corpus size.
    QueryDef("q447_hll_distinct",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("source"), explode(Text.tokens(col("text"))).as("__t"))
        val exact = toks.groupBy("source")
          .agg(countDistinct(col("__t")).as("n_exact"))
        Sketches.hllEstimate(toks, "source", "__t")
          .join(exact, "source")
          .select(col("source"), col("n_exact"), col("n_present"),
            col("v_zero"), col("est_raw"), col("est_lc"), col("est"),
            expr("(abs(est - n_exact) * 1000000) div n_exact")
              .as("err_ppm"),
            col("merge_ok"))
          .orderBy("source")
      },
      Some {
        val h = DuckSql.hashLong("tok")
        val lc = FixedPoint.duckLnMicroFp20(
          FixedPoint.duckRatioFp20("(64 - v_zero)", "v_zero"))
        s"""WITH t AS (SELECT source, unnest(${DuckSql.toks("text")}) AS tok
        |  FROM documents),
        |hh AS (SELECT source, $h AS h FROM t),
        |rg AS (SELECT source, h // 67108864 AS bucket,
        |    CASE WHEN h % 67108864 = 0 THEN 27
        |      ELSE 27 - length(format('{:b}', h % 67108864)) END AS rank,
        |    h % 2 AS par
        |  FROM hh),
        |regs AS (SELECT source, bucket, max(rank) AS m,
        |    greatest(coalesce(max(CASE WHEN par = 0 THEN rank END), 0),
        |      coalesce(max(CASE WHEN par = 1 THEN rank END), 0)) AS mm
        |  FROM rg GROUP BY 1, 2),
        |ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT)
        |    AS n_exact FROM t GROUP BY 1),
        |sk AS (SELECT source, count(*) AS n_present,
        |    sum(1::BIGINT << CAST(40 - m AS INTEGER)) AS dp,
        |    min(CASE WHEN m = mm THEN 1 ELSE 0 END) AS mok
        |  FROM regs GROUP BY 1),
        |s2 AS (SELECT source, n_present, 64 - n_present AS v_zero,
        |    dp + (64 - n_present) * 1099511627776 AS denom, mok
        |  FROM sk),
        |s3 AS (SELECT source, n_present, v_zero, mok,
        |    (${Sketches.AlphaM2Milli} * ${Sketches.DenomScale}) // (1000 * denom) AS est_raw,
        |    CASE WHEN v_zero > 0 THEN (64 * $lc) // 1000000 END AS est_lc
        |  FROM s2),
        |s4 AS (SELECT source, n_present, v_zero, mok, est_raw, est_lc,
        |    CASE WHEN v_zero > 0 AND est_raw <= 160 THEN est_lc
        |      ELSE est_raw END AS est
        |  FROM s3)
        |SELECT s4.source, ex.n_exact,
        |  CAST(n_present AS BIGINT) AS n_present,
        |  CAST(v_zero AS BIGINT) AS v_zero,
        |  CAST(est_raw AS BIGINT) AS est_raw,
        |  CAST(est_lc AS BIGINT) AS est_lc,
        |  CAST(est AS BIGINT) AS est,
        |  CAST((abs(est - n_exact) * 1000000) // n_exact AS BIGINT)
        |    AS err_ppm,
        |  mok = 1 AS merge_ok
        |FROM s4 JOIN ex ON s4.source = ex.source
        |ORDER BY s4.source""".stripMargin
      }),

    // ---- q448: isotonic calibration (pool-adjacent-violators) ----------
    // The monotone calibration FIT past q308's ECE readout: a
    // deliberately mis-calibrated scorer (md5 scores with planted
    // rate bumps at bins 4 and 7, so the bin rates are non-monotone)
    // is repaired by PAV — each pass dissolves every violating
    // boundary (cross-multiplied integer mean compares, no division)
    // and 9 passes guarantee the fixed point for 10 bins. The oracle
    // replays all 9 passes as chained CTEs, so the hash equality IS
    // the pooling computation. Corpus → bin frame is one aggregation;
    // every PAV window orders the 10-row bin frame only.
    QueryDef("q448_isotonic_pav",
      (s, d) => {
        val bins = documents(s, d)
          .select((Sampling.hashLong(concat(col("doc_id").cast("string"),
            lit("#cal"))) % 1000).as("score"),
            (Sampling.hashLong(concat(col("doc_id").cast("string"),
              lit("#lab"))) % 1000).as("__draw"))
          .withColumn("__p", expr("score div 2 + " +
            "IF(score div 100 = 4, 350, 0) + IF(score div 100 = 7, 250, 0)"))
          .withColumn("__y", (col("__draw") < col("__p")).cast("long"))
          .groupBy(expr("score div 100").as("bin"))
          .agg(count(lit(1)).as("n"), sum("__y").as("pos"))
        Eval.pavPool(bins, "bin", "n", "pos", passes = 9)
          .select(col("bin"), col("n"), col("pos").as("n_pos"),
            expr("(pos * 1000000) div n").as("raw_ppm"),
            col("grp"), col("cal_ppm"))
          .orderBy("bin")
      },
      Some {
        val sc = DuckSql.hashLong("CAST(doc_id AS VARCHAR) || '#cal'")
        val lb = DuckSql.hashLong("CAST(doc_id AS VARCHAR) || '#lab'")
        val passes = (1 to 9).map { k =>
          val prev = s"b${k - 1}"
          s"""g$k AS (SELECT g, sum(n) AS w, sum(pos) AS sp FROM $prev
          |  GROUP BY 1),
          |m$k AS (SELECT g, CASE WHEN lag(sp) OVER (ORDER BY g) IS NULL
          |    OR NOT (lag(sp) OVER (ORDER BY g) * w
          |            > sp * lag(w) OVER (ORDER BY g))
          |    THEN 1 ELSE 0 END AS start FROM g$k),
          |i$k AS (SELECT g, sum(start) OVER (ORDER BY g
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS idx
          |  FROM m$k),
          |x$k AS (SELECT g AS og, min(g) OVER (PARTITION BY idx) AS ng
          |  FROM i$k),
          |b$k AS (SELECT bin, n, pos, ng AS g FROM $prev
          |  JOIN x$k ON $prev.g = x$k.og)""".stripMargin
        }.mkString(",\n")
        s"""WITH s0 AS (SELECT doc_id, $sc % 1000 AS score,
        |    $lb % 1000 AS draw FROM documents),
        |s1 AS (SELECT score // 100 AS bin,
        |    CASE WHEN draw < score // 2
        |      + CASE WHEN score // 100 = 4 THEN 350 ELSE 0 END
        |      + CASE WHEN score // 100 = 7 THEN 250 ELSE 0 END
        |    THEN 1 ELSE 0 END AS y FROM s0),
        |b0 AS (SELECT bin, count(*) AS n, sum(y) AS pos, bin AS g
        |  FROM s1 GROUP BY 1),
        |$passes,
        |pool AS (SELECT g, sum(n) AS w, sum(pos) AS sp FROM b9 GROUP BY 1)
        |SELECT CAST(b9.bin AS BIGINT) AS bin, CAST(b9.n AS BIGINT) AS n,
        |  CAST(b9.pos AS BIGINT) AS n_pos,
        |  CAST((b9.pos * 1000000) // b9.n AS BIGINT) AS raw_ppm,
        |  CAST(b9.g AS BIGINT) AS grp,
        |  CAST((pool.sp * 1000000) // pool.w AS BIGINT) AS cal_ppm
        |FROM b9 JOIN pool ON b9.g = pool.g ORDER BY bin""".stripMargin
      }),

    // ---- q449: batch-perceptron trained linear classifier --------------
    // The TRAINED half of the q316 linear-scorer story: a binary
    // classifier (is the doc English?) over the q315 hashed features,
    // fit by three full-batch perceptron rounds — round r adds
    // Σ y·x over the docs misclassified under w_{r−1} (w₀ = 0, so
    // round 1's update is Σ over all docs; zero-margin counts as
    // misclassified). Everything integer: counts, weights, margins —
    // so the oracle replays all three rounds as chained CTEs and the
    // hash equality is the training computation itself. Scale shape:
    // features stay in (doc, dim, f) tuple form; each round is one
    // broadcast join against the O(64) weight frame + two map-side-
    // combining aggs; the corpus is never collected or re-tokenized
    // (features computed once behind the first agg).
    QueryDef("q449_batch_perceptron",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
        val feats = Classify.hashedFeatures(documents(s, d), "doc_id",
          "text", when(col("lang") === "en", 1L).otherwise(-1L))
        val (ws, ms) = Classify.perceptronFit(feats, docs, rounds = 3)
        val counts = ms(0).agg(count(lit(1)).as("n_upd1"))
          .crossJoin(ms(1).agg(count(lit(1)).as("n_upd2")))
          .crossJoin(ms(2).agg(count(lit(1)).as("n_upd3")))
        s.range(0, 64).select(col("id").as("dim"))
          .join(ws(0).withColumnRenamed("w", "w_r1"), Seq("dim"), "left")
          .join(ws(1).withColumnRenamed("w", "w_r2"), Seq("dim"), "left")
          .join(ws(2).withColumnRenamed("w", "w_r3"), Seq("dim"), "left")
          .crossJoin(broadcast(counts))
          .select(col("dim"),
            coalesce(col("w_r1"), lit(0L)).as("w_r1"),
            coalesce(col("w_r2"), lit(0L)).as("w_r2"),
            coalesce(col("w_r3"), lit(0L)).as("w_r3"),
            col("n_upd1"), col("n_upd2"), col("n_upd3"))
          .orderBy("dim")
      },
      Some {
        val dim = DuckSql.hashLong("tok")
        val sgn = DuckSql.hashLong("'s:' || tok")
        s"""WITH dd AS (SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y FROM documents),
        |t AS (SELECT doc_id, unnest(${DuckSql.toks("text")}) AS tok
        |  FROM documents),
        |f AS (SELECT t.doc_id, dd.y, $dim % 64 AS dim,
        |    sum($sgn % 2 * 2 - 1) AS f
        |  FROM t JOIN dd ON t.doc_id = dd.doc_id GROUP BY 1, 2, 3
        |  HAVING sum($sgn % 2 * 2 - 1) != 0),
        |w1 AS (SELECT dim, sum(y * f) AS w FROM f GROUP BY 1),
        |s2 AS (SELECT f.doc_id, sum(f.f * w1.w) AS s FROM f
        |  JOIN w1 USING (dim) GROUP BY 1),
        |m2 AS (SELECT dd.doc_id FROM dd LEFT JOIN s2 USING (doc_id)
        |  WHERE coalesce(dd.y * s2.s, 0) <= 0),
        |u2 AS (SELECT dim, sum(y * f) AS u FROM f
        |  JOIN m2 USING (doc_id) GROUP BY 1),
        |w2 AS (SELECT coalesce(w1.dim, u2.dim) AS dim,
        |    coalesce(w, 0) + coalesce(u, 0) AS w
        |  FROM w1 FULL JOIN u2 ON w1.dim = u2.dim),
        |s3 AS (SELECT f.doc_id, sum(f.f * w2.w) AS s FROM f
        |  JOIN w2 USING (dim) GROUP BY 1),
        |m3 AS (SELECT dd.doc_id FROM dd LEFT JOIN s3 USING (doc_id)
        |  WHERE coalesce(dd.y * s3.s, 0) <= 0),
        |u3 AS (SELECT dim, sum(y * f) AS u FROM f
        |  JOIN m3 USING (doc_id) GROUP BY 1),
        |w3 AS (SELECT coalesce(w2.dim, u3.dim) AS dim,
        |    coalesce(w, 0) + coalesce(u, 0) AS w
        |  FROM w2 FULL JOIN u3 ON w2.dim = u3.dim),
        |g AS (SELECT unnest(generate_series(0, 63)) AS dim)
        |SELECT CAST(g.dim AS BIGINT) AS dim,
        |  CAST(coalesce(w1.w, 0) AS BIGINT) AS w_r1,
        |  CAST(coalesce(w2.w, 0) AS BIGINT) AS w_r2,
        |  CAST(coalesce(w3.w, 0) AS BIGINT) AS w_r3,
        |  (SELECT CAST(count(*) AS BIGINT) FROM dd) AS n_upd1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM m2) AS n_upd2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM m3) AS n_upd3
        |FROM g LEFT JOIN w1 ON g.dim = w1.dim
        |LEFT JOIN w2 ON g.dim = w2.dim
        |LEFT JOIN w3 ON g.dim = w3.dim
        |ORDER BY g.dim""".stripMargin
      }),

    // ---- q450: functional-dependency discovery ledger -------------------
    // Data profiling past the q243 declared-constraint audit: CANDIDATE
    // functional dependencies measured, not asserted — per candidate
    // A→B, the distinct-lhs count, how many lhs values map to >1 rhs,
    // and the g3 error (fraction of rows to delete for the FD to hold
    // — the approximate-FD metric). The ledger mixes keys that hold
    // (nation PK, the lineitem composite PK) with plausible-but-false
    // dependencies, so both outcomes are exercised. One groupBy chain
    // per candidate, each emitting one row; nothing row-pairing, no
    // candidate touches another's table scan.
    QueryDef("q450_fd_discovery",
      (s, d) => {
        val rows = Seq(
          fdRow(nation(s, d), "nation", "n_nationkey", "n_regionkey",
            col("n_nationkey"), col("n_regionkey")),
          fdRow(customer(s, d), "customer", "c_custkey", "c_nationkey",
            col("c_custkey"), col("c_nationkey")),
          fdRow(customer(s, d), "customer", "c_nationkey", "c_mktsegment",
            col("c_nationkey"), col("c_mktsegment")),
          fdRow(orders(s, d), "orders", "o_custkey", "o_orderpriority",
            col("o_custkey"), col("o_orderpriority")),
          fdRow(lineitem(s, d), "lineitem", "l_orderkey", "l_partkey",
            col("l_orderkey"), col("l_partkey")),
          fdRow(lineitem(s, d), "lineitem", "l_partkey", "l_suppkey",
            col("l_partkey"), col("l_suppkey")),
          fdRow(lineitem(s, d), "lineitem", "l_orderkey#l_linenumber",
            "l_partkey",
            concat(col("l_orderkey").cast("string"), lit("#"),
              col("l_linenumber").cast("string")), col("l_partkey")),
          fdRow(documents(s, d), "documents", "source", "lang",
            col("source"), col("lang")))
        rows.reduce(_ unionByName _).orderBy("tbl", "lhs", "rhs")
      },
      Some {
        val blocks = Seq(
          duckFd("nation", "n_nationkey", "n_regionkey",
            "n_nationkey", "n_regionkey"),
          duckFd("customer", "c_custkey", "c_nationkey",
            "c_custkey", "c_nationkey"),
          duckFd("customer", "c_nationkey", "c_mktsegment",
            "c_nationkey", "c_mktsegment"),
          duckFd("orders", "o_custkey", "o_orderpriority",
            "o_custkey", "o_orderpriority"),
          duckFd("lineitem", "l_orderkey", "l_partkey",
            "l_orderkey", "l_partkey"),
          duckFd("lineitem", "l_partkey", "l_suppkey",
            "l_partkey", "l_suppkey"),
          duckFd("lineitem", "l_orderkey#l_linenumber", "l_partkey",
            "CAST(l_orderkey AS VARCHAR) || '#' || " +
              "CAST(l_linenumber AS VARCHAR)", "l_partkey"),
          duckFd("documents", "source", "lang", "source", "lang"))
        blocks.mkString("", "\nUNION ALL\n", "\nORDER BY tbl, lhs, rhs")
      })
  )
}
