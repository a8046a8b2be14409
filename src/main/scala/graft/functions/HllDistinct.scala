package graft.functions

import graft.ops.{FixedPoint, Sketches}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate —
  * the register-array twin of [[KmvDistinct]] and the AGGREGATE form
  * of the relational register pipeline in `ops/Sketches.hllEstimate`
  * (q447/q467): 64 six-bit registers, constant 64-byte state per
  * group, merge = element-wise max, so partial aggregation and
  * shuffle-side combine are native.
  *
  * The child must be a pre-computed hash uniform on [0, 2³²) —
  * `Sampling.hashLong`'s md5 band — which is what makes the estimate
  * bit-reproducible: the evaluator runs the SAME integer formula as
  * `Sketches.hllEstimate` (shared α/scale constants, FixedPoint table
  * ln for the linear-counting branch), so the two computation paths
  * must agree exactly (the q471 in-query identity law; partition-count
  * invariance pinned in HllSpec).
  */
case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](64)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to the documented [0, 2³²) contract: the function is in the
      // SQL registry, so a caller can feed it a column that is NOT
      // Sampling.hashLong output — without the mask a negative or
      // >= 2³² value indexes outside the 64-register array and kills
      // the executor. Masked, any long still lands in a valid register
      // (pre-hashed inputs are unchanged: the mask is identity there).
      val h = v.asInstanceOf[Number].longValue() & 0xFFFFFFFFL
      val bucket = (h / 67108864L).toInt // top 6 of the 32 hash bits
      val rest = h % 67108864L // low 26 bits
      val rank =
        if (rest == 0L) 27
        else 27 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // the exact integer formula of Sketches.hllEstimate: denominator
    // Σ 2^(40 − M[j]) (empty registers contribute 2^40), raw harmonic
    // estimate, linear counting when zero registers exist and the raw
    // estimate is ≤ 2.5m
    var denom = 0L
    var vZero = 0L
    var i = 0
    while (i < 64) {
      val m = buf(i).toInt
      if (m == 0) vZero += 1
      denom += (1L << (40 - m))
      i += 1
    }
    val estRaw = (Sketches.AlphaM2Milli * Sketches.DenomScale) / (1000L * denom)
    if (vZero > 0 && estRaw <= 160L)
      64L * FixedPoint.lnMicroLong(
        FixedPoint.ratioFp20Long(64L - vZero, vZero)) / 1000000L
    else estRaw
  }

  // clone on both sides: the framework may hand back byte arrays that
  // alias reused row buffers, and merge mutates its left argument
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
