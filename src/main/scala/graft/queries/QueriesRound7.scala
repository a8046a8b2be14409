package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Sampling, Similarity, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-7 first batch — index/layout lifecycles and their measured
  * readouts:
  *  - q290: ANN index persistence (train IVF once → write → load →
  *    search with no Lloyd anywhere in the search plan — the q285
  *    write→read lifecycle applied to the vector index);
  *  - q291: Z-order vs linear clustering, min/max-stat pruning
  *    measured against the true match count;
  *  - q292: Bloom-filter dedup gate with measured false-positive rate
  *    (false negatives provably zero);
  *  - q293: persisted LSH band index + incremental dedup of a new
  *    batch with the existing corpus never re-shingled.
  */
object QueriesRound7 {

  private val Dim = 64

  val defs: Seq[QueryDef] = Seq(

    // ---- q290: IVF index lifecycle (train → write → load → search) ---
    // Same index parameters and query batch as q54 (nCells=16,
    // nProbe=4, k=5, queries = vec_id < 20), so the oracle replays the
    // identical deterministic pipeline — a hash match proves the
    // persisted-index path loses NOTHING vs in-query training. The
    // search half's plan scans the centroid parquet, folds it into one
    // broadcast row of (cell, centroid, norm) structs, and assigns
    // cells map-side (Round7Spec pins: no aggregation over the corpus
    // before the candidate join, index scanned not recomputed).
    QueryDef("q290_ivf_index_lifecycle",
      (s, d) => {
        val emb = embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dir = s"${Scratch.dir(s, d)}/q290_ivf_index"
        Similarity.centroidIndexDF(s, Similarity.trainCentroids(emb, 16))
          .write.mode("overwrite").parquet(dir)
        Similarity.ivfTopKFromIndex(emb, emb.where(col("vec_id") < 20),
          k = 5, s.read.parquet(dir))
          .orderBy("query_id", "neighbor_id")
      },
      Some {
        def dotD(a: String, b: String) =
          s"list_sum(list_transform(generate_series(1, $Dim), " +
            s"j -> CAST($a[j] AS DOUBLE) * $b))"
        val dotEmb = DuckSql.dot("e.embedding", "s.embedding", Dim)
        s"""WITH emb AS (SELECT vec_id, embedding,
        |    sqrt(${DuckSql.dot("embedding", "embedding", Dim)}) AS nrm FROM embeddings),
        |c AS (SELECT count(*) AS n FROM emb),
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
        |    embedding
        |  FROM (SELECT vec_id, embedding FROM emb, c
        |        WHERE ${DuckSql.hashLong("vec_id")} % greatest(n // 16, 1) = 0
        |        ORDER BY vec_id LIMIT 16)),
        |sn AS (SELECT cell, embedding,
        |    sqrt(${DuckSql.dot("embedding", "embedding", Dim)}) AS cn FROM seeds),
        |a0 AS (SELECT e.vec_id,
        |    (max(struct_pack(c := $dotEmb / (e.nrm * s.cn), cell := s.cell))).cell AS cell
        |  FROM emb e CROSS JOIN sn s GROUP BY e.vec_id),
        |mean AS (SELECT a0.cell, p.i AS pos,
        |    list_sum(list(CAST(e.embedding[p.i] AS DOUBLE) ORDER BY e.vec_id)) / count(*) AS m
        |  FROM emb e JOIN a0 USING (vec_id)
        |  CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS i) p
        |  GROUP BY 1, 2),
        |cent AS (SELECT cell, list(CAST(CAST(m AS FLOAT) AS DOUBLE) ORDER BY pos) AS cv
        |  FROM mean GROUP BY 1),
        |cn AS (SELECT cell, cv,
        |    sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn FROM cent),
        |a1 AS (SELECT e.vec_id,
        |    (max(struct_pack(c := ${dotD("e.embedding", "cn.cv[j]")} / (e.nrm * cn.cn),
        |      cell := cn.cell))).cell AS cell
        |  FROM emb e CROSS JOIN cn GROUP BY e.vec_id),
        |pr AS (SELECT q.vec_id AS query_id, cn.cell,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY ${dotD("q.embedding", "cn.cv[j]")} / (q.nrm * cn.cn) DESC,
        |        cn.cell DESC) AS pr_rn
        |  FROM emb q CROSS JOIN cn WHERE q.vec_id < 20),
        |cand AS (SELECT p.query_id, a1.vec_id AS neighbor_id,
        |    round(${DuckSql.dot("qe.embedding", "ce.embedding", Dim)} / (qe.nrm * ce.nrm), 4) + 0 AS cosine
        |  FROM pr p
        |  JOIN a1 ON a1.cell = p.cell AND p.pr_rn <= 4
        |  JOIN emb ce ON ce.vec_id = a1.vec_id
        |  JOIN emb qe ON qe.vec_id = p.query_id
        |  WHERE a1.vec_id != p.query_id)
        |SELECT query_id, neighbor_id, cosine FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rn FROM cand)
        |WHERE rn <= 5 ORDER BY query_id, neighbor_id""".stripMargin
      }),

    // ---- q291: Z-order layout pruning readout -------------------------
    // The multi-dimensional clustering technique every lakehouse uses
    // to make min/max footer stats prune on TWO dims at once: rows
    // bucket on (l_partkey, l_suppkey), the Z-value interleaves the two
    // 8-bit bucket ids, and "files" are Z-ranges (vs a linear layout
    // clustered on x only). Per-file min/max stats answer a box
    // predicate the way a parquet reader would, and the readout
    // compares files/rows scanned under both layouts against the true
    // match count — the measured form of "Z-order reads less". Pure
    // integer arithmetic (bit ops + integer div), one pass for stats
    // per layout, extents broadcast.
    QueryDef("q291_zorder_pruning",
      (s, d) => {
        val ext = lineitem(s, d).agg(
          max(col("l_partkey")).cast("long").as("mx"),
          max(col("l_suppkey")).cast("long").as("my"))
        // consumed by two layout aggregations + the true-match count
        val b = lineitem(s, d)
          .select(col("l_partkey").cast("long").as("x"),
            col("l_suppkey").cast("long").as("y"))
          .crossJoin(broadcast(ext))
          .withColumn("bx", expr("x * 256 div (mx + 1)"))
          .withColumn("by", expr("y * 256 div (my + 1)"))
          .withColumn("z", (0 until 8).map { i =>
            shiftleft(shiftright(col("bx"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
              shiftleft(shiftright(col("by"), i).bitwiseAND(lit(1L)), 2 * i)
          }.reduce(_ + _))
          .withColumn("xlo", expr("(mx + 1) div 5"))
          .withColumn("xhi", expr("(mx + 1) * 3 div 10"))
          .withColumn("ylo", expr("(my + 1) div 5"))
          .withColumn("yhi", expr("(my + 1) * 3 div 10"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val scanCond = col("min_x") <= col("xhi") && col("max_x") >= col("xlo") &&
          col("min_y") <= col("yhi") && col("max_y") >= col("ylo")
        def layout(name: String, fileCol: Column): DataFrame =
          b.withColumn("__f", fileCol)
            .groupBy("__f")
            .agg(min("x").as("min_x"), max("x").as("max_x"),
              min("y").as("min_y"), max("y").as("max_y"),
              count(lit(1)).as("n_rows"),
              first("xlo").as("xlo"), first("xhi").as("xhi"),
              first("ylo").as("ylo"), first("yhi").as("yhi"))
            .agg(count(lit(1)).as("n_files"),
              sum(when(scanCond, 1L).otherwise(0L)).as("files_scanned"),
              sum(when(scanCond, col("n_rows")).otherwise(0L)).as("rows_scanned"))
            .withColumn("layout", lit(name))
        val matched = b.where(col("x") >= col("xlo") && col("x") <= col("xhi") &&
            col("y") >= col("ylo") && col("y") <= col("yhi"))
          .agg(count(lit(1)).as("rows_matched"))
        layout("linear_x", col("bx"))
          .unionByName(layout("zorder", expr("z div 256")))
          .crossJoin(broadcast(matched))
          .select("layout", "n_files", "files_scanned", "rows_scanned",
            "rows_matched")
          .orderBy("layout")
      },
      Some {
        val zSql = (0 until 8).map(i =>
          s"(((bx >> $i) & 1) << ${2 * i + 1}) + (((by >> $i) & 1) << ${2 * i})")
          .mkString(" + ")
        def layoutSql(name: String, fileExpr: String) =
          s"""SELECT '$name' AS layout, count(*) AS n_files,
             |  sum(CASE WHEN mn_x <= xhi AND mx_x >= xlo
             |    AND mn_y <= yhi AND mx_y >= ylo THEN 1 ELSE 0 END) AS files_scanned,
             |  sum(CASE WHEN mn_x <= xhi AND mx_x >= xlo
             |    AND mn_y <= yhi AND mx_y >= ylo THEN n ELSE 0 END) AS rows_scanned
             |FROM (SELECT $fileExpr AS f, min(x) AS mn_x, max(x) AS mx_x,
             |    min(y) AS mn_y, max(y) AS mx_y, count(*) AS n
             |  FROM z GROUP BY 1), box""".stripMargin
        s"""WITH ext AS (SELECT CAST(max(l_partkey) AS BIGINT) AS mx,
        |    CAST(max(l_suppkey) AS BIGINT) AS my FROM lineitem),
        |b AS (SELECT CAST(l_partkey AS BIGINT) AS x,
        |    CAST(l_suppkey AS BIGINT) AS y,
        |    (CAST(l_partkey AS BIGINT) * 256) // (mx + 1) AS bx,
        |    (CAST(l_suppkey AS BIGINT) * 256) // (my + 1) AS by
        |  FROM lineitem, ext),
        |z AS (SELECT x, y, bx, by, $zSql AS z FROM b),
        |box AS (SELECT (mx + 1) // 5 AS xlo, ((mx + 1) * 3) // 10 AS xhi,
        |    (my + 1) // 5 AS ylo, ((my + 1) * 3) // 10 AS yhi FROM ext),
        |m AS (SELECT count(*) AS rows_matched FROM z, box
        |  WHERE x BETWEEN xlo AND xhi AND y BETWEEN ylo AND yhi),
        |l1 AS (${layoutSql("linear_x", "bx")}),
        |l2 AS (${layoutSql("zorder", "z // 256")})
        |SELECT layout, CAST(n_files AS BIGINT) AS n_files,
        |  CAST(files_scanned AS BIGINT) AS files_scanned,
        |  CAST(rows_scanned AS BIGINT) AS rows_scanned,
        |  CAST(rows_matched AS BIGINT) AS rows_matched
        |FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2), m
        |ORDER BY layout""".stripMargin
      }),

    // ---- q292: Bloom-filter dedup gate with measured FP rate ----------
    // The cheap FIRST gate of incremental dedup at 100 TB: the existing
    // corpus's content fingerprints set k=4 md5-derived positions in an
    // m = 2^15-bit filter (here a DISTINCT position table — the
    // degenerate-but-exact relational form whose size is min(n·k, m));
    // an incoming batch claims "seen" iff all 4 of its positions are
    // set. The readout measures the claim against exact membership:
    // false positives are the filter's design trade (rate reported in
    // ppm), false negatives MUST be zero (the Bloom theorem — asserted
    // by the oracle match, not just eyeballed). All joins are keyed on
    // fingerprints/positions; nothing doc × doc.
    QueryDef("q292_bloom_dedup",
      (s, d) => {
        val m = 1 << 15
        val kh = 4
        val all = documents(s, d)
          .select(col("doc_id"), md5(Text.normText(col("text"))).as("fp"))
        val existing = all.where(col("doc_id") % 10 =!= 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val incoming = all.where(col("doc_id") % 10 === 0)
        val flagged = Dedup.bloomClaimed(existing, incoming, "fp", m, kh)
          .join(existing.select(col("fp")).distinct()
            .withColumn("__ex", lit(1)), Seq("fp"), "left")
          .withColumn("exact", col("__ex").isNotNull)
        val bitCount = existing.select("fp").distinct()
          .select(col("fp"), explode(sequence(lit(0), lit(kh - 1))).as("j"))
          .select((Sampling.hashLong(concat(col("fp"), lit("#bl"),
            col("j").cast("string"))) % m).as("p"))
          .agg(countDistinct(col("p")).as("n_bits_set"))
        flagged.agg(
            count(lit(1)).as("n_incoming"),
            sum(when(col("claimed"), 1L).otherwise(0L)).as("n_claimed"),
            sum(when(col("exact"), 1L).otherwise(0L)).as("n_exact"),
            sum(when(col("claimed") && !col("exact"), 1L).otherwise(0L))
              .as("n_false_pos"),
            sum(when(col("exact") && !col("claimed"), 1L).otherwise(0L))
              .as("n_false_neg"))
          .crossJoin(broadcast(bitCount))
          .select(col("n_incoming"), col("n_claimed"), col("n_exact"),
            col("n_false_pos"), col("n_false_neg"), col("n_bits_set"),
            expr("(n_false_pos * 1000000) div greatest(n_incoming - n_exact, 1)")
              .as("fp_rate_ppm"))
      },
      Some {
        val m = 1 << 15
        def posSql(fpExpr: String) =
          s"${DuckSql.hashLong(s"$fpExpr || '#bl' || j")} % $m"
        s"""WITH a AS (SELECT doc_id, md5(${DuckSql.norm("text")}) AS fp
        |  FROM documents),
        |ex AS (SELECT DISTINCT fp FROM a WHERE doc_id % 10 <> 0),
        |inc AS (SELECT doc_id, fp FROM a WHERE doc_id % 10 = 0),
        |js AS (SELECT unnest(generate_series(0, 3)) AS j),
        |bits AS (SELECT DISTINCT ${posSql("fp")} AS p FROM ex, js),
        |ip AS (SELECT doc_id, ${posSql("fp")} AS p FROM inc, js),
        |hits AS (SELECT ip.doc_id, count(*) AS nhit
        |  FROM ip JOIN bits USING (p) GROUP BY 1),
        |fl AS (SELECT inc.doc_id,
        |    coalesce(hits.nhit, 0) = 4 AS claimed,
        |    inc.fp IN (SELECT fp FROM ex) AS exact
        |  FROM inc LEFT JOIN hits ON inc.doc_id = hits.doc_id),
        |agg AS (SELECT count(*) AS n_incoming,
        |    sum(CASE WHEN claimed THEN 1 ELSE 0 END) AS n_claimed,
        |    sum(CASE WHEN exact THEN 1 ELSE 0 END) AS n_exact,
        |    sum(CASE WHEN claimed AND NOT exact THEN 1 ELSE 0 END) AS n_false_pos,
        |    sum(CASE WHEN exact AND NOT claimed THEN 1 ELSE 0 END) AS n_false_neg
        |  FROM fl),
        |nb AS (SELECT count(*) AS n_bits_set FROM bits)
        |SELECT CAST(n_incoming AS BIGINT) AS n_incoming,
        |  CAST(n_claimed AS BIGINT) AS n_claimed,
        |  CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(n_false_pos AS BIGINT) AS n_false_pos,
        |  CAST(n_false_neg AS BIGINT) AS n_false_neg,
        |  CAST(n_bits_set AS BIGINT) AS n_bits_set,
        |  CAST((n_false_pos * 1000000) // greatest(n_incoming - n_exact, 1)
        |    AS BIGINT) AS fp_rate_ppm
        |FROM agg, nb""".stripMargin
      }),

    // ---- q293: persisted band-index incremental dedup -----------------
    // The dedup twin of q290's index lifecycle: the existing corpus's
    // LSH band index (Dedup.bandIndex — (id, band) rows) is WRITTEN
    // once, and a new ingest batch deduplicates against the LOADED
    // index plus itself (Dedup.incrementalCandidatePairs) without ever
    // re-shingling or re-hashing the existing corpus. Banding is
    // per-document, so incremental candidates decompose exactly: the
    // oracle runs the full-corpus banding and keeps pairs touching the
    // new batch — a hash match proves the persisted-index path finds
    // the identical pair set.
    QueryDef("q293_incremental_band_index",
      (s, d) => {
        import QueriesDedup.{Bands, K, ShingleN}
        val docs = documents(s, d)
        val existing = docs.where(col("doc_id") % 10 =!= 0)
        val batch = docs.where(col("doc_id") % 10 === 0)
        val dir = s"${Scratch.dir(s, d)}/q293_band_index"
        Dedup.bandIndex(existing, "doc_id", "text", ShingleN, K, Bands)
          .write.mode("overwrite").parquet(dir)
        Dedup.incrementalCandidatePairs(
          Dedup.bandIndex(batch, "doc_id", "text", ShingleN, K, Bands),
          s.read.parquet(dir), "doc_id")
          .orderBy("id_a", "id_b")
      },
      Some(s"""${QueriesDedup.lshCtes()}
        |SELECT id_a, id_b FROM cand
        |WHERE id_a % 10 = 0 OR id_b % 10 = 0
        |ORDER BY 1, 2""".stripMargin))
  )
}
