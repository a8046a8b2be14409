package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The S5 device-capture source as a REAL custom streaming source — a
  * DataSourceV2 `MicroBatchStream` replacing the r7 file-drop
  * stand-in (reference `system_audio_collector.py:29-65` records from
  * an audio device in chunks; no such device exists in the sandbox,
  * so the chunk PAYLOAD is synthesized deterministically while the
  * entire planning surface is real: offsets, rate-limited batch
  * planning, per-device partitions, restart-safe offset json, and a
  * BATCH_READ twin so stream-vs-batch equality reads the SAME table
  * both ways).
  *
  * {{{
  * spark.readStream.format("graft-audio-capture")
  *   .option("devices", "2")        // one input partition per device
  *   .option("totalChunks", "40")   // per device; bounded run
  *   .option("chunksPerBatch", "7") // rate limit per micro-batch
  *   .load()
  * }}}
  *
  * Schema: (device_id string, seq long, capture_ts timestamp_ntz,
  * content binary) — content is a real RIFF/WAVE blob (16 kHz mono
  * 16-bit PCM, 50 + seq%40 frames, deterministic waveform), so
  * downstream lanes exercise the real byte parsers.
  *
  * Rate limiting is admission control (`SupportsAdmissionControl` +
  * `SupportsTriggerAvailableNow`, the rate-per-micro-batch pattern):
  * each trigger admits `chunksPerBatch` new seqs up to `totalChunks`
  * — the deterministic analogue of a device delivering audio in real
  * time, and the property the q425 lane pins (the run MUST take
  * ceil(total/perBatch) micro-batches; offsets/commit make each chunk
  * exactly-once).
  */
class AudioCaptureSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audio-capture"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AudioCapture.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AudioCaptureTable(schema, properties)
}

object AudioCapture {
  val schema: StructType = StructType(Seq(
    StructField("device_id", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("capture_ts", TimestampNTZType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** 2026-01-01T00:00:00 in epoch micros — capture_ts(seq) = Epoch +
    * seq · 100ms. Deterministic: restart replays identical rows. */
  val EpochMicros: Long = 1767225600000000L
  val ChunkMicros: Long = 100000L

  def frames(seq: Long): Int = (50 + (seq % 40)).toInt

  /** Deterministic 16 kHz mono PCM chunk — REAL WAV bytes (the
    * downstream lanes parse them with the native header parser). */
  def chunkBytes(device: Int, seq: Long): Array[Byte] = {
    val n = frames(seq)
    val samples = Array.tabulate(n) { i =>
      (((seq * 31 + device * 17 + i * 7) % 65536) - 32768).toShort
    }
    graft.ops.Multimodal.makeWav(16000, 1, samples)
  }

  def row(device: Int, seq: Long, fields: Array[String]): InternalRow =
    InternalRow.fromSeq(fields.toIndexedSeq.map {
      case "device_id" => UTF8String.fromString(s"dev-$device")
      case "seq" => seq
      case "capture_ts" => EpochMicros + seq * ChunkMicros
      case "content" => chunkBytes(device, seq)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
}

class AudioCaptureTable(schema: StructType, properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft_audio_capture"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AudioCaptureScanBuilder(schema, options)
}

class AudioCaptureScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AudioCaptureScan(required,
    math.max(1, Option(options.get("devices")).map(_.toInt).getOrElse(1)),
    math.max(0, Option(options.get("totalChunks")).map(_.toLong).getOrElse(20L)),
    math.max(1, Option(options.get("chunksPerBatch")).map(_.toLong).getOrElse(5L)))
}

/** Offset = number of chunk seqs made available per device. */
case class ChunkOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class AudioCapturePartition(device: Int, startSeq: Long, endSeq: Long)
    extends InputPartition

class AudioCaptureScan(required: StructType, devices: Int,
                       totalChunks: Long, chunksPerBatch: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required

  // ---- batch twin: the full bounded capture in one read ----
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until devices).map(d =>
      AudioCapturePartition(d, 0L, totalChunks): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AudioCaptureReaderFactory(required)

  // ---- micro-batch stream ----
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new AudioCaptureStream(required, devices, totalChunks, chunksPerBatch)
}

class AudioCaptureStream(required: StructType, devices: Int,
                         totalChunks: Long, chunksPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Admission control (the RatePerMicroBatchStream pattern): each
  // trigger admits at most `chunksPerBatch` new seqs — the honest
  // model of a device delivering audio in real time. Under
  // Trigger.AvailableNow Spark calls prepareForTriggerAvailableNow
  // once, then keeps running rate-limited micro-batches until the
  // prepared bound is reached — so a bounded test run still exercises
  // ceil(total/perBatch) genuine micro-batches. Restart safety:
  // offsets are plain counts and rows are a pure function of
  // (device, seq), so a restarted query replans exactly the
  // uncommitted range.
  override def initialOffset(): Offset = ChunkOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ChunkOffset].n
    ChunkOffset(math.min(totalChunks, s + chunksPerBatch))
  }

  override def reportLatestOffset(): Offset = ChunkOffset(totalChunks)

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def deserializeOffset(json: String): Offset =
    ChunkOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChunkOffset].n
    val e = end.asInstanceOf[ChunkOffset].n
    if (e <= s) Array.empty
    else (0 until devices).map(d =>
      AudioCapturePartition(d, s, e): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AudioCaptureReaderFactory(required)
}

class AudioCaptureReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AudioCapturePartition]
    new PartitionReader[InternalRow] {
      private val fields = required.fieldNames
      private var seq = p.startSeq - 1
      override def next(): Boolean = { seq += 1; seq < p.endSeq }
      override def get(): InternalRow = AudioCapture.row(p.device, seq, fields)
      override def close(): Unit = ()
    }
  }
}
