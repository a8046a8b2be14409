package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact bounded TOP-K as a TypedImperativeAggregate — the engine's
  * third custom aggregate (KMV, HLL, and now top-k), and the one that
  * retires the most expensive idiom in per-group analytics: "top k
  * rows per group" via a rank window sorts EVERY group's full row set
  * after a shuffle of EVERY row; this aggregate keeps O(k) state per
  * group, combines map-side (each partition forwards at most k pairs
  * per group), and merges like any algebraic aggregate — at 100 TB
  * the shuffle carries k rows per (group × partition) instead of the
  * corpus.
  *
  * Semantics: the k largest (key, id) pairs under (key DESC, id ASC)
  * — exactly `row_number() OVER (ORDER BY key DESC, id) <= k` when
  * `id` is unique (the caller's row id), which also makes the result
  * deterministic and partition-order-independent. Duplicate (key, id)
  * pairs collapse (the state is a set) — pass a unique id.
  * Returns array<struct<key, id>> in rank order.
  */
case class TopKPairs(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]] {

  require(k >= 1 && k <= 65536, s"graft_topk needs 1 <= k <= 65536, got $k")

  type Buffer = java.util.TreeSet[Array[Long]]

  // rank order: key DESC, id ASC — the set's head is rank 1 and the
  // set's last is the first element to evict past k
  private def cmp: Comparator[Array[Long]] = new Comparator[Array[Long]] {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(b(0), a(0)) // key desc
      if (c != 0) c else java.lang.Long.compare(a(1), b(1)) // id asc
    }
  }

  override def createAggregationBuffer(): Buffer =
    new java.util.TreeSet[Array[Long]](cmp)

  private def add(buf: Buffer, kv: Long, iv: Long): Unit = {
    buf.add(Array(kv, iv))
    if (buf.size > k) buf.remove(buf.last)
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) {
      add(buf, kv.asInstanceOf[Number].longValue(),
        iv.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); add(buf, p(0), p(1)) }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](p(0), p(1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, id)
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), id = newChildren(1))
}
