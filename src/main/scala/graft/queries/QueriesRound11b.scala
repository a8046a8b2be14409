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
        |FROM s ORDER BY doc_id, pos""".stripMargin))
  )
}
