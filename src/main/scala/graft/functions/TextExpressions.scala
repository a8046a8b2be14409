package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side accent folding shared by the interpreted and generated
  * paths of [[UnicodeStripAccents]].
  *
  * Semantics: Unicode NFD decomposition followed by removal of every
  * combining mark (category Mn). For precomposed Latin letters this is
  * exactly DuckDB's `strip_accents` (verified char-by-char for Latin-1
  * Supplement + Latin Extended-A incl. the non-decomposable
  * pass-throughs ß Ø ø æ Œ œ ł, which both engines leave unchanged), so
  * oracle queries replay it with `strip_accents(...)` verbatim.
  *
  * The ASCII fast path matters at corpus scale: most tokens in a web
  * corpus are pure ASCII, and for those the fold is the identity — the
  * scan below avoids the Normalizer allocation entirely and returns
  * the original UTF8String (zero copies).
  */
object UnicodeFoldUtil {
  private val Marks = "\\p{Mn}+".r

  def fold(s: UTF8String): UTF8String = {
    // numBytes == numChars ⇔ pure ASCII ⇔ NFD fold is the identity
    val bytes = s.numBytes()
    if (s.numChars() == bytes) s
    else {
      val nfd = java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)
      UTF8String.fromString(Marks.replaceAllIn(nfd, ""))
    }
  }
}

/** `graft_fold_accents(str)` — native accent-strip expression.
  *
  * Normalization-fold is in every curation pipeline's tokenize path
  * (dedup keys, language ID, vocabulary counts must not split on
  * `café` vs `cafe`), so it runs once per document per query: worth a
  * codegen expression over a Scala UDF (stays inside whole-stage
  * codegen, no Row boxing, ASCII rows never allocate). The heavy
  * non-ASCII path delegates to `java.text.Normalizer` — a JDK
  * library, identical on every executor JVM.
  *
  * Null propagates; the expression is deterministic and foldable-safe
  * (constant inputs constant-fold at plan time via nullSafeEval).
  */
case class UnicodeStripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_fold_accents expects string, got ${other.sql}")
    }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_fold_accents"

  override def nullSafeEval(input: Any): Any =
    UnicodeFoldUtil.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeFoldUtil.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
