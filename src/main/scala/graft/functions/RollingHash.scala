package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Karp-Rabin rolling hash over a token array: emits one 64-bit hash
  * per word n-gram, computed incrementally in O(tokens) total — the
  * "rolling" property that makes shingle fingerprinting linear instead
  * of O(tokens * n). Deterministic across JVMs (String.hashCode is
  * specified; arithmetic wraps mod 2^64).
  *
  * H_0   = sum_{j<n} h(t_j) * B^(n-1-j)
  * H_i+1 = (H_i - h(t_i) * B^(n-1)) * B + h(t_i+n)
  *
  * Interpreted eval (CodegenFallback): the per-row loop over a small
  * token array does not benefit from codegen the way the per-element
  * float loop of DotProduct does.
  */
case class RollingHashShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val B = 1000003L // prime base

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rolling_hash expects (array<string>) and n >= 1, got " +
            s"${child.dataType.sql} with n=$n")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](len)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i) // null array elements hash as 0
      h(i) = if (s == null) 0L else s.toString.hashCode.toLong
      i += 1
    }
    var bPow = 1L // B^(n-1)
    i = 1
    while (i < n) { bPow *= B; i += 1 }
    val out = new Array[Long](len - n + 1)
    var acc = 0L
    i = 0
    while (i < n) { acc = acc * B + h(i); i += 1 }
    out(0) = acc
    i = 1
    while (i <= len - n) {
      acc = (acc - h(i - 1) * bPow) * B + h(i + n - 1)
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
