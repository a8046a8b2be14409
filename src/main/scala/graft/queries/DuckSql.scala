package graft.queries

/** Shared DuckDB SQL fragments mirroring graft.ops.Text/Dedup
  * expression semantics, so oracle queries stay in lockstep with the
  * Spark implementations. All hashing is md5 (identical across
  * engines); all float outputs are computed in double and rounded.
  */
object DuckSql {

  /** Mirror of Text.normText. */
  def norm(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** Mirror of Text.tokens: non-empty whitespace tokens of norm text. */
  def toks(c: String): String =
    s"list_filter(string_split(${norm(c)}, ' '), x -> length(x) > 0)"

  /** Mirror of Dedup.wordShingles(n) on a token-list expression. */
  def shingles(toksExpr: String, n: Int): String =
    s"list_transform(generate_series(1, greatest(len($toksExpr) - ${n - 1}, 0)), " +
      s"i -> array_to_string(($toksExpr)[i:i+${n - 1}], ' '))"

  /** Mirror of Dedup.minhashSignature component j on a shingle list. */
  def minhashComponent(shinglesExpr: String, j: Int): String =
    s"list_min(list_transform($shinglesExpr, s -> md5(s || '#$j')))"

  /** Mirror of Similarity.dot for float-list columns (explicit double
    * math — never rely on engine-native vector functions whose
    * precision may differ). */
  def dot(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(generate_series(1, $dim), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def cosine(a: String, b: String, dim: Int): String =
    s"(${dot(a, b, dim)} / (sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)})))"

  /** Mirror of Sampling.hashLong: first 8 hex chars of md5(CAST(c AS
    * VARCHAR)) as a BIGINT (DuckDB 1.0 has no conv(); sum nibbles). */
  def hashLong(c: String): String = hexLong(s"md5(CAST($c AS VARCHAR))")

  /** First 8 hex chars of an EXISTING hex-string expression as a
    * BIGINT in [0, 2^32) — the Spark twin is
    * `conv(substring(h, 1, 8), 16, 10).cast("long")`. */
  def hexLong(c: String): String =
    (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr($c, ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ")")

  /** Mirror of functions.RollingHashShingles + array_min (q37): Karp-
    * Rabin polynomial hash per n-token shingle with Java semantics —
    * String.hashCode per token (32-bit signed wrap; tokens are ASCII
    * after normText, so UTF-16 units == ascii codes) and mod-2^64
    * signed accumulation, done in HUGEINT with explicit wrap. The
    * rolling recurrence equals the direct polynomial, so the oracle
    * computes each shingle directly. */
  def rollingFpMin(toksExpr: String, n: Int, base: Long): String = {
    // BIGINT codes keep the fold 64-bit (INT32 would overflow at acc*31)
    val hc = "list_reduce(list_transform(generate_series(1, length(tk)), " +
      "ci -> CAST(ascii(substr(tk, ci, 1)) AS BIGINT)), " +
      "(acc, c) -> (acc * 31 + c) % 4294967296)"
    val th = s"list_transform($toksExpr, tk -> " +
      s"CAST((CASE WHEN $hc >= 2147483648 THEN $hc - 4294967296 ELSE $hc END) AS BIGINT))"
    def u(h: String) = s"(CASE WHEN $h < 0 THEN CAST($h AS HUGEINT) + 18446744073709551616 " +
      s"ELSE CAST($h AS HUGEINT) END)"
    val acc = (1 until n).foldLeft(u("th[i]")) { (a, j) =>
      s"(($a * $base + ${u(s"th[i+$j]")}) % 18446744073709551616)"
    }
    val sig = s"CAST((CASE WHEN $acc >= 9223372036854775808 " +
      s"THEN $acc - 18446744073709551616 ELSE $acc END) AS BIGINT)"
    s"(SELECT list_min(list_transform(generate_series(1, greatest(len(th) - ${n - 1}, 0)), " +
      s"i -> $sig)) FROM (SELECT $th AS th))"
  }

  /** Mirror of Dedup.simhash16 on a token-list expression: 16 bits
    * from the first 4 hex nibbles of md5(token), +1/-1 votes, sign. */
  def simhash16(toksExpr: String): String = {
    val bitSums = (0 until 16).map { i =>
      val nibbleIdx = i / 4 + 1
      val shift = 3 - (i % 4)
      s"(CASE WHEN coalesce(list_sum(list_transform($toksExpr, tok -> " +
        s"2 * (((strpos('0123456789abcdef', substr(md5(tok), $nibbleIdx, 1)) - 1) >> $shift) & 1) - 1" +
        s")), 0) > 0 THEN ${1L << (15 - i)} ELSE 0 END)"
    }
    bitSums.mkString("(", " + ", ")")
  }

  /** Mirror of Dedup.simhash(nBits) for widths up to 64. Accumulates
    * in HUGEINT (bit 63's weight exceeds BIGINT) and wraps to the
    * signed BIGINT Spark's long fingerprint carries. Pass a let-bound
    * token column (CTE) as toksExpr — the expression references it
    * nBits times. */
  def simhashBits(toksExpr: String, nBits: Int): String = {
    val bitSums = (0 until nBits).map { i =>
      val nibbleIdx = i / 4 + 1
      val shift = 3 - (i % 4)
      s"(CASE WHEN coalesce(list_sum(list_transform($toksExpr, tok -> " +
        s"2 * (((strpos('0123456789abcdef', substr(md5(tok), $nibbleIdx, 1)) - 1) >> $shift) & 1) - 1" +
        s")), 0) > 0 THEN CAST('${BigInt(1) << (nBits - 1 - i)}' AS HUGEINT) ELSE 0 END)"
    }
    val total = bitSums.mkString("(", " + ", ")")
    s"CAST((CASE WHEN $total >= 9223372036854775808 " +
      s"THEN $total - 18446744073709551616 ELSE $total END) AS BIGINT)"
  }

  /** Recursive-CTE connected components over a prior `cand(id_a,
    * id_b)` CTE — the oracle twin of `Dedup.duplicateGroups*` (q45/
    * q46/q91/q172 share this grouping rule; it must live in exactly
    * one place). Yields `grp(id, group_id = component-min id)`. The
    * enclosing WITH must be RECURSIVE. */
  val ccGroupCtes: String =
    """edges AS (SELECT id_a AS a, id_b AS b FROM cand
      |  UNION SELECT id_b, id_a FROM cand),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |grp AS (SELECT a AS id, least(a, min(b)) AS group_id FROM reach GROUP BY a)""".stripMargin
}
