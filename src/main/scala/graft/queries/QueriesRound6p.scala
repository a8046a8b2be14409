package graft.queries

import graft.Tables._
import graft.ops.{Graph, Sampling}
import org.apache.spark.sql.functions._

/** Round-6 sixteenth batch: pre-join cardinality auditing, DAG wave
  * scheduling, ColBERT-style late-interaction scoring, and the
  * noised-release shape that rounds out the privacy lane.
  */
object QueriesRound6p {

  val defs: Seq[QueryDef] = Seq(

    // ---- q275: join-cardinality audit (pre-flight safety check) ------
    // The check a 100 TB pipeline runs BEFORE a quadratic-risk join:
    // per-key counts on both sides predict the exact output size
    // (Σ cnt_a·cnt_b) and expose the hottest key — for the cost of two
    // map-side-combined aggregations over an O(keys) frame, you learn
    // whether the join would explode and where, without running it.
    // Here the riskiest shape — a fact-table SELF-join on l_partkey
    // (sliced) — and the audit's prediction is then CHECKED against
    // the actually-executed join: predicted == actual is the
    // hash-verified theorem (the q233 discipline).
    QueryDef("q275_join_cardinality_audit",
      (s, d) => {
        val li = lineitem(s, d).where(col("l_partkey") % 50 === 0)
          .select("l_partkey", "l_orderkey")
        val counts = li.groupBy("l_partkey")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("sq", col("cnt") * col("cnt"))
        val summary = counts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("sq")).as("predicted_pairs"))
        val hot = counts.orderBy(col("sq").desc, col("l_partkey").asc)
          .limit(1).select(col("l_partkey").as("hot_key"),
            col("sq").as("hot_key_pairs"))
        val actual = li.select(col("l_partkey"), col("l_orderkey").as("a"))
          .join(li.select(col("l_partkey"), col("l_orderkey").as("b")),
            "l_partkey")
          .agg(count(lit(1)).as("actual_pairs"))
        summary.crossJoin(broadcast(hot)).crossJoin(broadcast(actual))
          .withColumn("prediction_exact",
            col("predicted_pairs") === col("actual_pairs"))
      },
      Some("""WITH li AS (SELECT l_partkey, l_orderkey FROM lineitem
        |  WHERE l_partkey % 50 = 0),
        |c AS (SELECT l_partkey, count(*) AS cnt,
        |    count(*) * count(*) AS sq FROM li GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(sq) AS BIGINT) AS predicted_pairs FROM c),
        |h AS (SELECT l_partkey AS hot_key, CAST(sq AS BIGINT)
        |    AS hot_key_pairs
        |  FROM c ORDER BY sq DESC, l_partkey LIMIT 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS actual_pairs
        |  FROM li x JOIN li y USING (l_partkey))
        |SELECT s.n_keys, s.predicted_pairs, h.hot_key, h.hot_key_pairs,
        |  a.actual_pairs,
        |  s.predicted_pairs = a.actual_pairs AS prediction_exact
        |FROM s, h, a""".stripMargin)),

    // ---- q276: DAG topological wave scheduling -----------------------
    // Kahn's algorithm as a bounded distributed peel
    // (Graph.topoLayers): wave r = nodes with no unfinished
    // dependency, the readout that tells a pipeline scheduler what can
    // run in parallel and when. The dependency DAG is synthesized
    // deterministically over doc ids (i → i + (i mod 7) + 1 — strictly
    // forward, so acyclic by construction); 4 waves peel, deeper nodes
    // report layer -1 (budget reached, same bounded-knob semantics as
    // k-core). Output: per-layer population and id range. Oracle
    // replays all four peels as chained CTEs.
    QueryDef("q276_topo_layers",
      (s, d) => {
        val e = documents(s, d).where(col("doc_id") < 400)
          .select(col("doc_id").as("src"),
            (col("doc_id") + col("doc_id") % 7 + 1).as("dst"))
        Graph.topoLayers(e, "src", "dst", rounds = 4)
          .groupBy("layer")
          .agg(count(lit(1)).as("n_nodes"),
            min(col("id")).as("min_id"), max(col("id")).as("max_id"))
          .orderBy("layer")
      },
      Some {
        def peel(alive: String, r: Int, out: String) =
          s"""b$r AS (SELECT DISTINCT e.dst AS id FROM e
          |  JOIN $alive sa ON sa.id = e.src
          |  JOIN $alive da ON da.id = e.dst),
          |w$r AS (SELECT a.id, $r AS layer FROM $alive a
          |  LEFT JOIN b$r b ON b.id = a.id WHERE b.id IS NULL),
          |$out AS (SELECT a.id FROM $alive a
          |  LEFT JOIN w$r w ON w.id = a.id WHERE w.id IS NULL)""".stripMargin
        s"""WITH e AS (SELECT doc_id AS src,
        |    doc_id + doc_id % 7 + 1 AS dst
        |  FROM documents WHERE doc_id < 400),
        |n0 AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |${peel("n0", 1, "n1")},
        |${peel("n1", 2, "n2")},
        |${peel("n2", 3, "n3")},
        |${peel("n3", 4, "n4")},
        |lay AS (SELECT id, layer FROM w1 UNION ALL SELECT id, layer FROM w2
        |  UNION ALL SELECT id, layer FROM w3 UNION ALL SELECT id, layer FROM w4
        |  UNION ALL SELECT id, -1 AS layer FROM n4)
        |SELECT CAST(layer AS INT) AS layer,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
        |FROM lay GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // ---- q277: late-interaction MaxSim scoring (ColBERT shape) -------
    // Multi-vector retrieval: score(q, d) = Σ over query sub-vectors
    // of max over doc sub-vectors of their dot product — finer-grained
    // than single-vector cosine because each query aspect matches its
    // best region of the document. Sub-vectors here are the four
    // 16-dim slices of the 64-dim embedding; dots run on
    // millis-quantized BIGINTs (the q254 discipline — float-free,
    // engine-identical). Shape: sub-vectors explode 4× (bounded
    // fan-out), the 4-row probe broadcast-joins every doc sub-vector,
    // max folds per (doc, query-slot), sum folds per doc — two
    // map-side-combined aggs, never doc×doc.
    QueryDef("q277_maxsim_late_interaction",
      (s, d) => {
        val qv = transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long"))
        val subs = embeddings(s, d).select(col("vec_id"), qv.as("__q"))
          .select(col("vec_id"), posexplode(array((0 until 4).map(sl =>
            slice(col("__q"), sl * 16 + 1, 16)): _*)).as(Seq("sub", "v")))
        val probe = broadcast(subs.where(col("vec_id") === 0)
          .select(col("sub").as("qs"), col("v").as("qv")))
        val dots = subs.crossJoin(probe)
          .select(col("vec_id"), col("qs"),
            aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b),
              lit(0L), (acc, x) => acc + x).as("dot"))
        val best = dots.groupBy("vec_id", "qs").agg(max("dot").as("m"))
        graft.ops.Relational.topK(
          best.groupBy("vec_id").agg(sum("m").as("maxsim")),
          Seq(col("maxsim").desc, col("vec_id").asc), 10)
      },
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |subs AS (SELECT vec_id, s.s AS sub, q[16*s.s+1:16*s.s+16] AS v
        |  FROM e, (SELECT unnest(generate_series(0, 3)) AS s) s),
        |p AS (SELECT sub AS qs, v AS qv FROM subs WHERE vec_id = 0),
        |dots AS (SELECT d.vec_id, p.qs,
        |    CAST(list_sum(list_transform(generate_series(1, 16),
        |      i -> d.v[i] * p.qv[i])) AS BIGINT) AS dot
        |  FROM subs d, p),
        |best AS (SELECT vec_id, qs, max(dot) AS m FROM dots GROUP BY 1, 2)
        |SELECT vec_id, CAST(sum(m) AS BIGINT) AS maxsim
        |FROM best GROUP BY 1
        |ORDER BY maxsim DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- q278: noised count release (the DP release shape) -----------
    // Completes the privacy lane (k-anonymity q249, l-diversity q267):
    // aggregate counts leave the enclave only with additive noise and
    // a non-negativity clamp — the differential-privacy release
    // STRUCTURE, with the noise draw replaced by an md5-derived
    // uniform offset in [-10, 10] so the release is reproducible and
    // hash-verifiable. (A real ε-DP release needs a fresh Laplace draw
    // per release — the value this query pins is the plumbing: noise
    // keyed per cell, clamp, and true counts never in the output
    // schema.) One map-side-combining aggregation; noise is a pure
    // per-row expression on the O(cells) frame.
    QueryDef("q278_noised_release",
      (s, d) => {
        val cells = documents(s, d).groupBy("lang", "source")
          .agg(count(lit(1)).as("__true"))
        cells.select(col("lang"), col("source"),
          greatest(col("__true") +
            (Sampling.hashLong(concat(col("lang"), lit("|"), col("source"),
              lit("#dp"))) % 21 - 10), lit(0L)).as("released_count"))
          .orderBy("lang", "source")
      },
      Some(s"""SELECT lang, source,
        |  greatest(count(*) +
        |    (${DuckSql.hashLong("lang || '|' || source || '#dp'")} % 21 - 10),
        |    0) AS released_count
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
