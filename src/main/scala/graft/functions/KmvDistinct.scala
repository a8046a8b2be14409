package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the custom-sketch aggregation path
  * (SURVEY §2B UDF/UDAF row: "TypedImperativeAggregate for sketches").
  *
  * The buffer holds the k smallest 64-bit hashes seen; merge is a
  * union-and-trim, so partial aggregation and shuffle-side combine
  * work like any algebraic aggregate. Estimate: (k-1) / r_k where r_k
  * is the k-th smallest hash normalized to (0, 1); below k distinct
  * values the count is exact. Standard error ~ 1/sqrt(k-2).
  *
  * Two hashing modes:
  *  - hashBits == 0 (default): hash the child internally with
  *    XxHash64, normalizing r_k over the full signed 64-bit range.
  *  - hashBits > 0: the child IS a pre-computed hash, uniform on
  *    [0, 2^hashBits) — e.g. the md5-derived 32-bit Sampling.hashLong.
  *    r_k normalizes over 2^hashBits and the estimate uses floor(),
  *    which makes it bit-reproducible in portable SQL (the DuckDB
  *    oracle recomputes the identical k-th-minimum estimate, so the
  *    sketch is hash-verifiable end to end — q74).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    hashBits: Int = 0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"graft_kmv_distinct needs k >= 2 (got $k): " +
    "the estimator is (k-1)/r_k and k below 2 degenerates")

  type Buffer = java.util.TreeSet[java.lang.Long]

  override def createAggregationBuffer(): Buffer = new java.util.TreeSet[java.lang.Long]()

  private def add(buf: Buffer, h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.remove(buf.last) // keep k smallest
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      if (hashBits > 0) add(buf, v.asInstanceOf[Number].longValue())
      else add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: Buffer): Any = {
    if (buf.size < k) buf.size.toLong
    else if (hashBits > 0) {
      // pre-hashed child uniform on [0, 2^hashBits): u = r_k / 2^bits.
      // floor() (not round) so the oracle's CAST(floor(...) AS BIGINT)
      // mirrors it exactly
      val kth = buf.last.longValue()
      val u = kth.toDouble / math.pow(2.0, hashBits)
      if (u <= 0.0) buf.size.toLong else math.floor((k - 1) / u).toLong
    } else {
      // map signed hash space onto (0, 1): u = (h - Long.Min) / 2^64
      val kth = buf.last.longValue()
      val u = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      if (u <= 0.0) buf.size.toLong else math.round((k - 1) / u)
    }
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
