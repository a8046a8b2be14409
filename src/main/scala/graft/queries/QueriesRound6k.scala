package graft.queries

import graft.Tables._
import graft.ops.{Relational, Sampling, Text}
import org.apache.spark.sql.functions._

/** Round-6 eleventh batch: the interval-overlap join (1D grid
  * discipline), golden-record survivorship (the merge step entity
  * resolution was missing), and positional phrase search over the
  * inverted-index machinery.
  */
object QueriesRound6k {

  val defs: Seq[QueryDef] = Seq(

    // ---- q255: interval overlap join ---------------------------------
    // Which of a customer's fulfilled order windows overlap their open
    // order windows: intervals [day(o_orderdate), +(o_orderkey%20)+1)
    // in integer epoch-days, F-status vs O-status sides, equality on
    // the customer plus grid cells of 32 days
    // (Relational.intervalOverlapJoin — each pair emitted exactly once
    // by the overlap-start cell, no distinct). The quadratic
    // per-customer oracle must agree exactly; overlap length is
    // integer days.
    QueryDef("q255_interval_overlap",
      (s, d) => {
        def side(status: String) = orders(s, d)
          .where(col("o_orderstatus") === status)
          .select(col("o_custkey"), col("o_orderkey"),
            expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("s"),
            (expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000") +
              col("o_orderkey") % 20 + 1).as("e"))
        Relational.intervalOverlapJoin(
            side("F").withColumnRenamed("o_orderkey", "ok_f"),
            side("O").withColumnRenamed("o_orderkey", "ok_o"),
            Seq("o_custkey"), "ok_f", "ok_o", "s", "e", cellSize = 32L)
          .orderBy("o_custkey", "ok_f", "ok_o")
      },
      Some("""WITH iv AS (SELECT o_custkey, o_orderkey, o_orderstatus,
        |    epoch_us(o_orderdate) // 86400000000 AS s,
        |    epoch_us(o_orderdate) // 86400000000 + o_orderkey % 20 + 1 AS e
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |f AS (SELECT * FROM iv WHERE o_orderstatus = 'F'),
        |o AS (SELECT * FROM iv WHERE o_orderstatus = 'O')
        |SELECT f.o_custkey, f.o_orderkey AS ok_f, o.o_orderkey AS ok_o,
        |  CAST(least(f.e, o.e) - greatest(f.s, o.s) AS BIGINT) AS overlap
        |FROM f JOIN o ON f.o_custkey = o.o_custkey
        |  AND f.s < o.e AND o.s < f.e
        |ORDER BY 1, 2, 3""".stripMargin)),

    // ---- q256: golden-record survivorship ----------------------------
    // The MERGE step of entity resolution: deterministic synthetic
    // contact records (md5-driven nulls) clustered by doc_id % 97;
    // each field keeps its value from the LATEST non-null member
    // (field-level survivorship — the golden record can combine fields
    // no single member carries). The per-field argmax is one
    // lexicographic max over zero-padded (ts, id) prefixes
    // (Relational.goldenRecord) — no struct comparators, no
    // null-ordering edge cases, one hash-agg total.
    QueryDef("q256_golden_record",
      (s, d) => {
        def h(tag: String) = Sampling.hashLong(
          concat(col("doc_id").cast("string"), lit(tag)))
        val recs = documents(s, d).select(
          (col("doc_id") % 97).as("cluster_id"),
          col("doc_id"), col("n_chars").cast("long").as("ts"),
          when(h("#em") % 3 =!= 0,
            concat(lit("u"), col("doc_id").cast("string"), lit("@x.com")))
            .as("email"),
          when(h("#ph") % 4 =!= 0,
            concat(lit("+1555"), lpad((h("#ph") % 10000).cast("string"), 4, "0")))
            .as("phone"))
        Relational.goldenRecord(recs, "cluster_id", "ts", "doc_id",
            Seq("email", "phone"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH recs AS (SELECT doc_id % 97 AS cluster_id, doc_id,
        |    CAST(n_chars AS BIGINT) AS ts,
        |    CASE WHEN ${DuckSql.hashLong("doc_id || '#em'")} % 3 <> 0
        |      THEN 'u' || doc_id || '@x.com' END AS email,
        |    CASE WHEN ${DuckSql.hashLong("doc_id || '#ph'")} % 4 <> 0
        |      THEN '+1555' || lpad(CAST(${DuckSql.hashLong("doc_id || '#ph'")}
        |        % 10000 AS VARCHAR), 4, '0') END AS phone
        |  FROM documents)
        |SELECT cluster_id,
        |  substr(max(CASE WHEN email IS NOT NULL THEN
        |    lpad(CAST(ts AS VARCHAR), 12, '0')
        |    || lpad(CAST(doc_id AS VARCHAR), 12, '0') || email END), 25)
        |    AS email,
        |  substr(max(CASE WHEN phone IS NOT NULL THEN
        |    lpad(CAST(ts AS VARCHAR), 12, '0')
        |    || lpad(CAST(doc_id AS VARCHAR), 12, '0') || phone END), 25)
        |    AS phone,
        |  CAST(count(*) AS BIGINT) AS n_members
        |FROM recs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q257: positional phrase search ------------------------------
    // Exact phrase matching ("hash agg") over token positions — the
    // capability a bag-of-words index (q214) cannot express: both
    // term posting streams are filtered BEFORE any shuffle (the q206
    // discipline — the exchange carries only matching terms, never the
    // corpus), and adjacency is an equi-join on (doc, position+1).
    // Per matching doc: occurrence count plus each term's own
    // frequency for scoring context.
    QueryDef("q257_phrase_search",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("doc_id"),
            posexplode(Text.tokens(col("text"))).as(Seq("p", "tok")))
        val t1 = toks.where(col("tok") === "hash")
          .select(col("doc_id"), col("p"))
        val t2 = toks.where(col("tok") === "agg")
          .select(col("doc_id"), (col("p") - 1).as("p"))
        val phrase = t1.join(t2, Seq("doc_id", "p"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_phrase"))
        val tf = toks.where(col("tok").isin("hash", "agg"))
          .groupBy("doc_id")
          .agg(sum(when(col("tok") === "hash", 1L).otherwise(0L)).as("n_t1"),
            sum(when(col("tok") === "agg", 1L).otherwise(0L)).as("n_t2"))
        phrase.join(tf, Seq("doc_id"))
          .select("doc_id", "n_phrase", "n_t1", "n_t2")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, ${DuckSql.toks("text")} AS toks
        |    FROM documents),
        |tok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS p,
        |    toks FROM t WHERE len(toks) > 0),
        |tk AS (SELECT doc_id, p, toks[p] AS tok FROM tok),
        |ph AS (SELECT a.doc_id, count(*) AS n_phrase
        |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        |  WHERE a.tok = 'hash' AND b.tok = 'agg' GROUP BY 1),
        |tf AS (SELECT doc_id,
        |    sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS n_t1,
        |    sum(CASE WHEN tok = 'agg' THEN 1 ELSE 0 END) AS n_t2
        |  FROM tk WHERE tok IN ('hash', 'agg') GROUP BY 1)
        |SELECT ph.doc_id, CAST(n_phrase AS BIGINT) AS n_phrase,
        |  CAST(n_t1 AS BIGINT) AS n_t1, CAST(n_t2 AS BIGINT) AS n_t2
        |FROM ph JOIN tf USING (doc_id) ORDER BY doc_id""".stripMargin)))
}
