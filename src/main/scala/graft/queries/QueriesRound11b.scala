package graft.queries

import graft.Tables._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-11 second batch: suffix-array construction — the exact index
  * under the exact-substring dedup family (the n-gram-window lanes
  * q170/q172 approximate what this computes exactly).
  */
object QueriesRound11b {

  private val MaxLen = 64 // per-doc prefix cap: bounds rounds at log2(64)

  val defs: Seq[QueryDef] = Seq(

    // ---- q581: suffix-array ranks by prefix doubling -------------------------------
    // Every suffix of every document's first 64 characters gets its
    // GLOBAL dense rank in suffix-sort order — built in 6 bounded
    // doubling rounds (rank of first 2h chars = dense rank of the
    // (rank_h(i), rank_h(i+h)) pair; one equi-join + one two-level
    // dense rank per round, no global sort, no single-partition
    // window, per-round localCheckpoints). The oracle computes the
    // SAME ranks the direct way — sort all suffix strings — so the
    // hash gate pins the entire doubling recursion: a single
    // mis-ranked pair anywhere shifts every dense rank above it.
    // Exact duplicate tails across documents share a rank in both
    // engines; that collision structure IS the suffix-array dedup
    // signal (Lee et al.), produced here without ever materializing a
    // suffix string on the Spark side — ranks are integers end to end,
    // O(positions) rows per round at any corpus size.
    QueryDef("q581_suffix_array_ranks",
      (s, d) => Dedup.suffixArrayRanks(documents(s, d), "doc_id", "text",
          MaxLen)
        .orderBy("doc_id", "pos"),
      Some(s"""WITH d AS (SELECT doc_id, substr(text, 1, $MaxLen) AS t
        |  FROM documents),
        |e AS (SELECT doc_id, t,
        |    unnest(generate_series(1, length(t))) AS j FROM d),
        |s AS (SELECT doc_id, CAST(j AS BIGINT) AS pos, substr(t, j) AS sfx
        |  FROM e)
        |SELECT doc_id, pos,
        |  CAST(dense_rank() OVER (ORDER BY sfx) AS BIGINT) AS suffix_rank
        |FROM s ORDER BY doc_id, pos""".stripMargin)),

    // ---- q582: LCP spectrum over SA-adjacent suffixes -------------------------------
    // What the suffix array is FOR: the longest-common-prefix of each
    // pair of ADJACENT distinct suffixes in SA order is the corpus's
    // complete repeated-substring inventory (any substring repeated
    // anywhere shows up as an adjacent-pair LCP — the Lee et al.
    // quantity), and its histogram is the duplicate-mass spectrum a
    // curation pipeline reads before choosing a dedup threshold.
    // Adjacency is FREE here: dense ranks are contiguous integers, so
    // the neighbor join is rank = rank + 1 — no row_number pass, no
    // sort. Rank ↔ capped-suffix-string is a bijection, so the
    // representative per rank is a plain dropDuplicates. The LCP walk
    // is a codegen'd 64-step scalar fold per pair (O(total chars) —
    // the same cost class as one more doubling round; the level-walk
    // alternative only pays off when suffixes are huge). Exact
    // duplicate suffixes (rank collisions) are counted separately —
    // that column IS the exact-tail duplicate mass.
    QueryDef("q582_suffix_lcp_spectrum",
      (s, d) => {
        val ranks = Dedup.suffixArrayRanks(documents(s, d), "doc_id",
          "text", MaxLen)
        val sfx = documents(s, d).select(col("doc_id"),
            substring(col("text"), 1, MaxLen).as("__t"))
          .select(col("doc_id"),
            explode(expr("sequence(1, length(__t))")).as("p"), col("__t"))
          .select(col("doc_id"), col("p").cast("long").as("pos"),
            expr(s"substring(__t, p, $MaxLen)").as("sfx"))
        val reps = ranks.join(sfx, Seq("doc_id", "pos"))
          .select(col("suffix_rank").as("r"), col("sfx"))
          .dropDuplicates("r")
          .localCheckpoint() // both sides of the neighbor join consume it
        val pairs = reps.select(col("r"), col("sfx").as("sa"))
          .join(reps.select((col("r") - 1).as("r"), col("sfx").as("sb")),
            Seq("r"))
          .withColumn("lcp", expr(s"""aggregate(sequence(1, $MaxLen), 0,
            |(acc, k) -> CASE WHEN acc = k - 1
            |  AND substring(sa, k, 1) != ''
            |  AND substring(sa, k, 1) = substring(sb, k, 1)
            |THEN k ELSE acc END)""".stripMargin).cast("long"))
        val lo = expr("""CASE WHEN lcp = 0 THEN 0 WHEN lcp < 4 THEN 1
          |WHEN lcp < 8 THEN 4 WHEN lcp < 16 THEN 8 WHEN lcp < 32 THEN 16
          |WHEN lcp < 64 THEN 32 ELSE 64 END""".stripMargin)
        val dist = pairs.withColumn("lcp_lo", lo)
          .groupBy("lcp_lo").agg(count(lit(1)).as("n_pairs"))
        val audit = pairs.agg(max("lcp").as("max_lcp"))
          .crossJoin(ranks.agg((count(lit(1)) -
            countDistinct("suffix_rank")).as("n_duplicate_suffixes")))
        dist.crossJoin(audit).orderBy("lcp_lo")
      },
      Some(s"""WITH d AS (SELECT doc_id, substr(text, 1, $MaxLen) AS t
        |  FROM documents),
        |e AS (SELECT doc_id, t,
        |    unnest(generate_series(1, length(t))) AS j FROM d),
        |rk AS (SELECT substr(t, j) AS sfx,
        |    dense_rank() OVER (ORDER BY substr(t, j)) AS r FROM e),
        |reps AS (SELECT DISTINCT r, sfx FROM rk),
        |lcps AS (SELECT list_max(list_transform(
        |    generate_series(1, $MaxLen),
        |    k -> CASE WHEN substr(a.sfx, 1, k) = substr(b.sfx, 1, k)
        |         THEN k ELSE 0 END)) AS lcp
        |  FROM reps a JOIN reps b ON b.r = a.r + 1),
        |dist AS (SELECT CASE WHEN lcp = 0 THEN 0 WHEN lcp < 4 THEN 1
        |    WHEN lcp < 8 THEN 4 WHEN lcp < 16 THEN 8 WHEN lcp < 32 THEN 16
        |    WHEN lcp < 64 THEN 32 ELSE 64 END AS lcp_lo,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM lcps GROUP BY 1),
        |audit AS (SELECT CAST(max(lcp) AS BIGINT) AS max_lcp FROM lcps),
        |dups AS (SELECT CAST(count(*) - count(DISTINCT r) AS BIGINT)
        |    AS n_duplicate_suffixes FROM rk)
        |SELECT dist.lcp_lo, dist.n_pairs, audit.max_lcp,
        |  dups.n_duplicate_suffixes
        |FROM dist, audit, dups ORDER BY dist.lcp_lo""".stripMargin))
  )
}
