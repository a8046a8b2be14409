package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for longest-common-subsequence length
  * over two token arrays — the ROUGE-L hot loop.
  *
  * LCS is inherently O(n·m) dynamic programming per pair; there is no
  * SQL-expressible form, and a Scala UDF would pay serialization plus
  * boxing per cell. This expression participates in whole-stage
  * codegen: the generated Java runs the classic two-rolling-rows DP
  * over the ArrayData buffers with zero allocation beyond the two int
  * rows. Null elements never match (tokens are non-null in practice;
  * a null must not equal anything rather than throw).
  *
  * Callers cap token arrays (e.g. slice(t, 1, 32)) so the per-pair
  * cost is a constant — the candidate-pair count, not the DP, is the
  * scale knob, exactly as in MinHash verification.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lcs expects (array<string>, array<string>), got " +
            s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lcs"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val ys = Array.tabulate(m)(j => if (y.isNullAt(j)) null else y.getUTF8String(j))
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = if (x.isNullAt(i)) null else x.getUTF8String(i)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai != null && ai.equals(ys(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ys = ctx.freshName("ys")
      val ai = ctx.freshName("ai")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val tmp = ctx.freshName("tmp")
      val u = classOf[UTF8String].getName
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |$u[] $ys = new $u[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  $ys[$j] = $b.isNullAt($j) ? null : $b.getUTF8String($j);
         |}
         |int[] $prev = new int[$m + 1];
         |int[] $cur = new int[$m + 1];
         |for (int $i = 0; $i < $n; $i++) {
         |  $u $ai = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  for (int $j = 1; $j <= $m; $j++) {
         |    if ($ai != null && $ai.equals($ys[$j - 1])) {
         |      $cur[$j] = $prev[$j - 1] + 1;
         |    } else {
         |      $cur[$j] = Math.max($prev[$j], $cur[$j - 1]);
         |    }
         |  }
         |  int[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |  java.util.Arrays.fill($cur, 0);
         |}
         |${ev.value} = (long) $prev[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
