package graft.ops

import graft.model.Segment
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed utterance assembly: merges time-ordered segments whose gap is
  * below `gapSec` into consolidated utterances (the Vosk word->segment
  * build at reference inputs/system_audio_collector.py:49-53 — start
  * of first word, duration to end of last, texts joined), as a
  * reusable `Aggregator` for `KeyValueGroupedDataset.agg`.
  *
  * Distributed contract: `reduce`/`merge` are order-insensitive (they
  * accumulate), all ordering happens once in `finish` — so the
  * aggregate is correct under any partitioning.
  */
class SegmentMerge(gapSec: Double)
    extends Aggregator[Segment, Seq[Segment], Seq[Segment]] {

  override def zero: Seq[Segment] = Seq.empty

  override def reduce(buf: Seq[Segment], s: Segment): Seq[Segment] = buf :+ s

  override def merge(a: Seq[Segment], b: Seq[Segment]): Seq[Segment] = a ++ b

  override def finish(buf: Seq[Segment]): Seq[Segment] = {
    val sorted = buf.sortBy(s => (s.start, s.duration, s.text))
    sorted.foldLeft(Vector.empty[Segment]) { (acc, s) =>
      acc.lastOption match {
        case Some(prev) if s.start - (prev.start + prev.duration) <= gapSec =>
          val end = math.max(prev.start + prev.duration, s.start + s.duration)
          acc.init :+ Segment(prev.start, end - prev.start,
            if (s.text.isEmpty) prev.text else s"${prev.text} ${s.text}".trim)
        case _ => acc :+ s
      }
    }
  }

  override def bufferEncoder: Encoder[Seq[Segment]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Segment]] = ExpressionEncoder()
}

object SegmentMerge {
  /** Column form for use in typed aggregations. */
  def merged(gapSec: Double): org.apache.spark.sql.TypedColumn[Segment, Seq[Segment]] =
    new SegmentMerge(gapSec).toColumn
}
