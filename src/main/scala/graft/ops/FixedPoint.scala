package graft.ops

/** Integer fixed-point logarithms — the engine's replacement for
  * float `log()` in RANKING expressions (the q336 discipline, finer
  * grained): a 1-ulp libm divergence between two engines (or two
  * builds) landing exactly on a floor boundary can flip a rank, so
  * ranking expressions never run a float log. Instead:
  *
  *   log2_micro(x) = e·10⁶ + TAB[top 8 mantissa bits]
  *
  * where x arrives as a fixed-point integer r = x·2²⁰, e =
  * bitlength(r)−1−20 is the integer part, and TAB is a 256-entry
  * micro-bits table of log2(1 + i/256). Every step is integer
  * arithmetic (bitlength, shift, table lookup), so the value is
  * bit-identical on any engine and any partitioning. Max error vs the
  * true log2 is one table step, log2(1 + 1/256) ≈ 0.0056 bits — far
  * below what any corpus-statistics ranking needs, and the point is
  * that the DEFINITION is exact, not that it approximates libm.
  *
  * The table is generated once from `StrictMath` (bit-exact on every
  * JVM) and the DuckDB fragment is printed from the SAME array at
  * call time, so the two engines share one source of truth by
  * construction.
  *
  * Overflow posture: callers build r with the split form
  * `(n div d)·2²⁰ + ((n mod d)·2²⁰) div d`, exact and BIGINT-safe
  * while d·2²⁰ < 2⁶³ (d < 8.8·10¹²) — beyond that (≫ 10 TB of tokens
  * in one readout) shard the readout or lift to decimal(38,0).
  */
object FixedPoint {

  /** Fraction bits of the fixed-point input: r = x · 2^Frac, x ≥ 1. */
  val Frac = 20
  val One: Long = 1L << Frac

  /** ln(2) in micro-nats — converts micro-bits to micro-nats. */
  val Ln2Micro = 693147L

  /** TAB[i] = round(log2(1 + i/256) · 10⁶). */
  val log2Tab: IndexedSeq[Long] = (0 until 256).map { i =>
    Math.round(StrictMath.log(1.0 + i / 256.0) / StrictMath.log(2.0) * 1e6)
  }

  /** Spark SQL fragment: micro-bits log2(r / 2²⁰) for an integral
    * column/fragment `r` with r ≥ 2²⁰. Everything is forced to
    * BIGINT — bare numeric literals parse as INT and downstream
    * multiplications (e.g. ×Ln2Micro) would overflow int under ANSI. */
  def sparkLog2MicroFp20(r: String): String = {
    val b = s"(length(bin($r)) - 1)"
    s"((CAST($b - $Frac AS BIGINT) * 1000000) + " +
      s"CAST(element_at(array(${log2Tab.mkString(", ")}), " +
      s"CAST(shiftright($r, $b - 8) - 256 AS INT) + 1) AS BIGINT))"
  }

  /** DuckDB SQL fragment mirroring [[sparkLog2MicroFp20]] — printed
    * from the same table, so the two engines agree bit-for-bit. */
  def duckLog2MicroFp20(r: String): String = {
    val b = s"(length(format('{:b}', $r)) - 1)"
    s"((CAST($b - $Frac AS BIGINT) * 1000000) + " +
      s"CAST(([${log2Tab.mkString(", ")}])" +
      s"[CAST(($r >> ($b - 8)) - 256 AS INTEGER) + 1] AS BIGINT))"
  }

  /** Spark SQL fragment: micro-NATS ln(r / 2²⁰), via micro-bits. */
  def sparkLnMicroFp20(r: String): String =
    s"((${sparkLog2MicroFp20(r)} * $Ln2Micro) div 1000000)"

  /** DuckDB twin of [[sparkLnMicroFp20]]. */
  def duckLnMicroFp20(r: String): String =
    s"((${duckLog2MicroFp20(r)} * $Ln2Micro) // 1000000)"

  /** Spark SQL fragment: the fixed-point ratio r = (1 + n/d)·2²⁰ from
    * integral fragments `n`, `d` (d ≥ 1) in the overflow-safe split
    * form — exact floor, never materializes n·2²⁰. */
  def sparkRatioFp20(n: String, d: String): String =
    s"(CAST($One AS BIGINT) + (($n div $d) * CAST($One AS BIGINT)) + " +
      s"((($n % $d) * CAST($One AS BIGINT)) div $d))"

  /** DuckDB twin of [[sparkRatioFp20]]. */
  def duckRatioFp20(n: String, d: String): String =
    s"(CAST($One AS BIGINT) + (($n // $d) * CAST($One AS BIGINT)) + " +
      s"((($n % $d) * CAST($One AS BIGINT)) // $d))"

  /** Scala-side evaluators of the SAME definitions — for computing
    * CONSTANTS at query-build time that are then printed as literals
    * into both engines' SQL (e.g. the q460 SPRT increments). Bit-equal
    * to the SQL fragments by construction (same table, same steps). */
  def ratioFp20Long(n: Long, d: Long): Long =
    One + (n / d) * One + ((n % d) * One) / d

  def log2MicroLong(r: Long): Long = {
    // precondition: the 256-entry mantissa table needs 8 fraction bits,
    // so r < 256 would make (b - 8) negative — a mod-64 JVM shift that
    // silently indexes garbage. Current callers always pass >= 2²⁰
    // (ratioFp20Long output); fail loudly for any future small-ratio use.
    require(r >= 256, s"log2MicroLong needs r >= 256 (8 mantissa bits), got $r")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(r)
    (b - Frac).toLong * 1000000L + log2Tab(((r >> (b - 8)) - 256).toInt)
  }

  def lnMicroLong(r: Long): Long = log2MicroLong(r) * Ln2Micro / 1000000L
}
