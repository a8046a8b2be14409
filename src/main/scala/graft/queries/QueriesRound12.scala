package graft.queries

import graft.Tables._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-12 batch: the suffix-array family composed END TO END (the
  * exact Lee et al. strike-and-reassemble on top of the q581/q582
  * index), and the round's other new lanes.
  */
object QueriesRound12 {

  private val MaxLen = 64 // per-doc prefix cap (the q581/q582 bound)
  private val MinRepeat = 16 // strike spans repeated >= 16 chars

  val defs: Seq[QueryDef] = Seq(

    // ---- q584: exact substring dedup — SA → LCP → strike → reassembly ---------------
    // The payoff lane of the suffix-array family: q581 builds the
    // index, q582 reads the repeated-substring inventory off it; this
    // lane runs the EXACT Lee et al. pipeline — strike every span of
    // >= 16 chars that occurs more than once in the corpus (found via
    // SA-adjacent LCPs + shared-rank exact tails, the standard SA
    // identity that repeated prefixes are contiguous in suffix order),
    // then reassemble each doc's remainder in order. The n-gram-window
    // (q170/q172) and fixed-grid (q180) lanes approximate this; the
    // oracle replays the same SA → LCP → cover → rebuild recursion as
    // chained CTEs, and the hash gate carries the REBUILT TEXT itself
    // (any mis-ranked suffix, off-by-one cover bound, or
    // wrong-order reassembly shifts some doc's kept_text). Every stage
    // is O(positions) rows on (doc, pos) or rank keys; the cover
    // explode is bounded by the 64-char cap.
    QueryDef("q584_sa_strike_reassemble",
      (s, d) => Dedup.saStrikeReassemble(documents(s, d), "doc_id",
          "text", MaxLen, MinRepeat)
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, substr(text, 1, $MaxLen) AS t
        |  FROM documents WHERE length(substr(text, 1, $MaxLen)) > 0),
        |e AS (SELECT doc_id, t,
        |    unnest(generate_series(1, length(t))) AS j FROM d),
        |s AS (SELECT doc_id, CAST(j AS BIGINT) AS pos, substr(t, j) AS sfx,
        |    CAST(length(t) - j + 1 AS BIGINT) AS slen FROM e),
        |rk AS (SELECT doc_id, pos, sfx, slen,
        |    dense_rank() OVER (ORDER BY sfx) AS r FROM s),
        |reps AS (SELECT DISTINCT r, sfx FROM rk),
        |lcps AS (SELECT a.r AS r, list_max(list_transform(
        |    generate_series(1, $MaxLen),
        |    k -> CASE WHEN substr(a.sfx, 1, k) = substr(b.sfx, 1, k)
        |         THEN k ELSE 0 END)) AS lcp
        |  FROM reps a JOIN reps b ON b.r = a.r + 1),
        |dc AS (SELECT r, count(*) AS c FROM rk GROUP BY r),
        |rep AS (SELECT rk.doc_id, rk.pos,
        |    GREATEST(coalesce(ln.lcp, 0), coalesce(lp.lcp, 0),
        |      CASE WHEN dc.c > 1 THEN rk.slen ELSE 0 END) AS replen
        |  FROM rk JOIN dc USING (r)
        |  LEFT JOIN lcps ln ON ln.r = rk.r
        |  LEFT JOIN lcps lp ON lp.r = rk.r - 1),
        |cov AS (SELECT DISTINCT doc_id,
        |    pos + unnest(generate_series(0, replen - 1)) AS j
        |  FROM rep WHERE replen >= $MinRepeat),
        |ch AS (SELECT doc_id, CAST(j AS BIGINT) AS j, substr(t, j, 1) AS c
        |  FROM e),
        |kept AS (SELECT ch.doc_id, ch.j, ch.c FROM ch
        |  LEFT JOIN cov ON cov.doc_id = ch.doc_id AND cov.j = ch.j
        |  WHERE cov.doc_id IS NULL),
        |agg AS (SELECT doc_id, string_agg(c, '' ORDER BY j) AS kept_text,
        |    CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(agg.kept_text, '') AS kept_text,
        |  coalesce(agg.n_kept, 0) AS n_kept,
        |  CAST(length(d.t) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_struck
        |FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin))
  )
}
