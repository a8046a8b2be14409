package graft

import graft.ops.{Eval, Sketches}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-independence properties for the round-8h batch: PAV
  * isotonic pooling vs the classic sequential stack algorithm,
  * binary-sign signature packing, and the HLL raw-estimator path on
  * planted cardinalities (the sf corpora only exercise the
  * linear-counting branch).
  */
class Round8hSpec extends SparkSpec {

  private val binSchema = StructType(Seq(
    StructField("bin", LongType), StructField("n", LongType),
    StructField("pos", LongType)))

  /** Classic sequential PAV (stack of pooled groups) — the textbook
    * algorithm the simultaneous-pass operator must agree with. */
  private def pavRef(bins: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for ((b, n, p) <- bins.sortBy(_._1)) {
      var (gMin, gMax, w, sp) = (b, b, n, p)
      while (st.nonEmpty && st.last._4 * w > sp * st.last._3) {
        val t = st.remove(st.length - 1)
        gMin = t._1; w += t._3; sp += t._4
      }
      st.append((gMin, gMax, w, sp))
    }
    val out = scala.collection.mutable.Map[Long, (Long, Long)]()
    val sorted = st.sortBy(_._1)
    for (i <- sorted.indices) {
      val (gMin, _, w, sp) = sorted(i)
      val hi = if (i + 1 < sorted.length) sorted(i + 1)._1 else Long.MaxValue
      for ((b, _, _) <- bins if b >= gMin && b < hi)
        out(b) = (gMin, Math.floorDiv(sp * 1000000L, w))
    }
    out.toMap
  }

  test("pavPool equals sequential stack PAV on random bin frames") {
    val rnd = new scala.util.Random(448)
    for (_ <- 1 to 8) {
      val nb = 6 + rnd.nextInt(6)
      val bins = (0L until nb).map(b =>
        (b, 1L + rnd.nextInt(20), 0L + rnd.nextInt(21)))
        .map { case (b, n, p) => (b, n, math.min(p, n)) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          bins.map(r => Row(r._1, r._2, r._3)), 3), binSchema)
      val got = Eval.pavPool(df, "bin", "n", "pos", passes = nb.toInt - 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val want = pavRef(bins)
      assert(got === want, s"bins=$bins")
      // conservation: pooled rates are means of the original counts
      val rates = got.toSeq.sortBy(_._1).map(_._2._2)
      assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
        s"non-monotone: $rates")
    }
  }

  test("binary-sign packing: signature bits equal per-dim signs") {
    val rnd = new scala.util.Random(446)
    val vecs = (0L until 40L).map(id =>
      (id, Seq.fill(64)(rnd.nextInt(2001).toLong - 1000)))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("v", ArrayType(LongType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(r => Row(r._1, r._2)), 4),
      schema)
    val packLo = "aggregate(transform(sequence(0, 31), " +
      "i -> IF(element_at(v, i + 1) >= 0L, shiftleft(1L, i), 0L)), " +
      "0L, (a, x) -> a + x)"
    val packHi = "aggregate(transform(sequence(0, 31), " +
      "i -> IF(element_at(v, i + 33) >= 0L, shiftleft(1L, i), 0L)), " +
      "0L, (a, x) -> a + x)"
    val got = df.withColumn("lo", expr(packLo)).withColumn("hi", expr(packHi))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2),
        r.getLong(3)))
    for ((_, v, lo, hi) <- got; i <- 0 until 64) {
      val bit = if (i < 32) (lo >> i) & 1L else (hi >> (i - 32)) & 1L
      assert((bit == 1L) === (v(i) >= 0L), s"dim $i of $v")
    }
    // self-distance is zero and signatures fit in 32 unsigned bits
    assert(got.forall { case (_, _, lo, hi) =>
      lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32) })
  }

  test("HLL raw-estimator path: planted cardinality within 3 sigma") {
    import spark.implicits._
    // 3000 distinct values: all 64 registers occupied w.h.p. -> the
    // harmonic estimator branch (v_zero = 0), which the sf corpora's
    // tiny per-source vocabularies never reach
    val df = (1 to 3000).map(i => ("g", s"tok$i")).toDF("grp", "v")
    val r = Sketches.hllEstimate(df, "grp", "v").collect().head
    val est = r.getAs[Long]("est")
    val vz = r.getAs[Long]("v_zero")
    assert(vz === 0L, "expected all registers occupied")
    assert(r.getAs[Boolean]("merge_ok"))
    // sigma = 1.04/sqrt(64) = 13%; 3 sigma = 39%
    assert(est > 1830 && est < 4170, s"est=$est for true 3000")
    // duplicates never move the estimate (insert-only max registers)
    val dup = df.union(df).union(df)
    val r2 = Sketches.hllEstimate(dup, "grp", "v").collect().head
    assert(r2.getAs[Long]("est") === est)
  }
}
