package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst-value adapters for the two HOT multimodal byte walks
  * (`ops/Multimodal.parseWavHeader` / `patchStats32`): same parsing
  * code as the interpreted UDF path, but the result is built directly
  * as an `InternalRow`/`ArrayData`, so the expressions below stay
  * inside whole-stage codegen with no encoder/ser-de round trip per
  * row. The cold multimodal lanes keep their scalar UDFs (inherent
  * byte-work, acceptable there — VERDICT r7 #4 called out only these
  * two as hot enough to port). */
object MultimodalExprUtil {

  val wavMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false),
    StructField("valid", BooleanType, nullable = false)))

  val patchStatType: ArrayType = ArrayType(StructType(Seq(
    StructField("patch_id", LongType, nullable = false),
    StructField("psum", LongType, nullable = false),
    StructField("psumsq", LongType, nullable = false))),
    containsNull = false)

  def wavMeta(bytes: Array[Byte]): InternalRow = {
    val m = graft.ops.Multimodal.parseWavHeader(bytes)
    new GenericInternalRow(Array[Any](m.sample_rate, m.channels,
      m.bits_per_sample, m.n_samples, m.duration_sec, m.valid))
  }

  val tarWalkType: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("err", StringType, nullable = false),
    StructField("n_entries", LongType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("flag", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  def tarWalk(bytes: Array[Byte]): InternalRow = {
    val w = graft.ops.Multimodal.tarWalkBytes(bytes)
    val es = new Array[Any](w.entries.length)
    var i = 0
    w.entries.foreach { e =>
      es(i) = new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(e.name),
        e.size, e.flag, e.offset))
      i += 1
    }
    new GenericInternalRow(Array[Any](w.valid,
      org.apache.spark.unsafe.types.UTF8String.fromString(w.err),
      w.n_entries, new GenericArrayData(es)))
  }

  def patchStats(bytes: Array[Byte]): ArrayData = {
    val ps = graft.ops.Multimodal.patchStats32(bytes)
    val arr = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      arr(i) = new GenericInternalRow(Array[Any](p.patch_id, p.psum, p.psumsq))
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** `graft_wav_meta(binary)` — RIFF/WAVE header parse as a native
  * codegen expression (struct out, errors-as-data `valid` flag). */
case class WavMetadataExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_wav_meta expects binary, got ${other.sql}")
  }

  override def dataType: DataType = MultimodalExprUtil.wavMetaType
  override def prettyName: String = "graft_wav_meta"

  override def nullSafeEval(input: Any): Any =
    MultimodalExprUtil.wavMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimodalExprUtil.wavMeta($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_tar_walk(binary)` — ustar shard header walk as a native
  * codegen expression: struct(valid, err, n_entries, entries) with
  * per-entry payload offsets, errors-as-data (bad magic / checksum /
  * truncation return valid=false with whatever parsed — a poisoned
  * shard never fails the task). Same walker as the fuzzed
  * [[graft.ops.Multimodal.tarWalkBytes]]; only the result assembly is
  * Catalyst-native. */
case class TarWalkExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tar_walk expects binary, got ${other.sql}")
  }

  override def dataType: DataType = MultimodalExprUtil.tarWalkType
  override def prettyName: String = "graft_tar_walk"

  override def nullSafeEval(input: Any): Any =
    MultimodalExprUtil.tarWalk(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimodalExprUtil.tarWalk($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_patch_stats(binary)` — ViT-style 8×8 patch Σ/Σ² over a
  * 32×32 BMP as a native codegen expression (array<struct> out,
  * empty array on invalid input). */
case class ImagePatchStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_patch_stats expects binary, got ${other.sql}")
  }

  override def dataType: DataType = MultimodalExprUtil.patchStatType
  override def prettyName: String = "graft_patch_stats"

  override def nullSafeEval(input: Any): Any =
    MultimodalExprUtil.patchStats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultimodalExprUtil.patchStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
