package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-9 twenty-first batch: TextRank keyword extraction —
  * weighted PageRank on the token co-occurrence graph.
  */
object QueriesRound9u {

  val defs: Seq[QueryDef] = Seq(

    // ---- q527: TextRank keywords ------------------------------------------------
    // Keyword extraction the graph way (Mihalcea & Tarau '04): nodes
    // are vocabulary tokens, edges are within-doc ADJACENCY counts
    // (both directions, self-loops dropped), and the importance
    // readout is weighted PageRank — three unrolled integer-micro
    // rounds (r' = 0.15 + 0.85·Σ r_u·w_uv/wout_u, every division a
    // floor, the q145/q503 discipline) with the full round history in
    // the output so each iteration is hash-pinned, not just the
    // final ranking. The graph is vocab-sized (edges bounded by
    // distinct adjacent pairs, never corpus-sized); the corpus is
    // touched ONCE to count adjacencies. Top-10 by final rank.
    QueryDef("q527_textrank_keywords",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("doc_id"), graft.ops.Text.tokens(col("text")).as("tks"))
        val pairs = toks
          .where(size(col("tks")) >= 2)
          .select(explode(expr(
            """flatten(transform(slice(tks, 1, size(tks) - 1), (t, i) ->
              |  array(struct(t AS a, tks[i + 1] AS b),
              |    struct(tks[i + 1] AS a, t AS b))))""".stripMargin)).as("e"))
          .where(col("e.a") =!= col("e.b"))
          .select(col("e.a").as("src"), col("e.b").as("dst"))
        val edges = pairs.groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val wout = edges.groupBy("src").agg(sum("w").as("wout"))
        val ew = edges.join(wout, Seq("src"))
        val r0 = wout.select(col("src").as("word"),
          lit(1000000L).as("r0"))
        def round(prev: org.apache.spark.sql.DataFrame, rc: String,
                  nc: String) =
          ew.join(prev.select(col("word").as("src"), col(rc)), Seq("src"))
            .groupBy(col("dst").as("word"))
            .agg(sum(expr(s"$rc * w div wout")).as("__in"))
            .select(col("word"),
              (lit(150000L) + expr("850 * __in div 1000")).as(nc))
            .join(prev, Seq("word"), "right")
            .select(col("word"), col(rc),
              coalesce(col(nc), lit(150000L)).as(nc))
        val r1 = round(r0.withColumnRenamed("r0", "r0"), "r0", "r1")
        val r2 = round(r1, "r1", "r2")
          .join(r1.select("word", "r0"), Seq("word"))
        val r3 = round(r2, "r2", "r3")
          .join(r2.select("word", "r0", "r1"), Seq("word"))
        r3.select(col("word"), col("r0"), col("r1"), col("r2"), col("r3"))
          .orderBy(desc("r3"), col("word")).limit(10)
      },
      Some {
        def roundCte(prev: String, cur: String) =
          s"""$cur AS (SELECT n.word,
             |    150000 + 850 * coalesce(agg.i, 0) // 1000 AS r
             |  FROM (SELECT word FROM r0) n
             |  LEFT JOIN (SELECT e.dst AS word,
             |      CAST(sum($prev.r * e.w // e.wout) AS BIGINT) AS i
             |    FROM ew e JOIN $prev ON $prev.word = e.src GROUP BY 1) agg
             |    ON agg.word = n.word)""".stripMargin
        s"""WITH tt AS (SELECT doc_id, ${DuckSql.toks("text")} AS tks
        |  FROM documents),
        |pr AS (SELECT unnest(flatten(list_transform(
        |      generate_series(1, greatest(len(tks) - 1, 0)),
        |      i -> [struct_pack(a := tks[i], b := tks[i + 1]),
        |        struct_pack(a := tks[i + 1], b := tks[i])]))) AS e
        |  FROM tt),
        |edges AS (SELECT e.a AS src, e.b AS dst, count(*) AS w
        |  FROM pr WHERE e.a != e.b GROUP BY 1, 2),
        |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout
        |  FROM edges GROUP BY 1),
        |ew AS (SELECT edges.src, edges.dst, CAST(edges.w AS BIGINT) AS w,
        |    wo.wout FROM edges JOIN wo ON wo.src = edges.src),
        |r0 AS (SELECT src AS word, CAST(1000000 AS BIGINT) AS r FROM wo),
        |${roundCte("r0", "r1")},
        |${roundCte("r1", "r2")},
        |${roundCte("r2", "r3")}
        |SELECT r0.word, r0.r AS r0, r1.r AS r1, r2.r AS r2, r3.r AS r3
        |FROM r0 JOIN r1 USING (word) JOIN r2 USING (word)
        |  JOIN r3 USING (word)
        |ORDER BY r3.r DESC, r0.word LIMIT 10""".stripMargin
      })
  )
}
