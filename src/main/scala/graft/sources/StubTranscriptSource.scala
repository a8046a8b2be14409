package graft.sources

import java.util

import graft.model.Schema
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source for transcript ingestion — the
  * `TableProvider` formulation of the S2 connector (SURVEY §2A S2:
  * "optionally a custom DataSourceV2 TableProvider").
  *
  * Usage:
  * {{{
  * spark.read.format("graft-stub-transcripts")
  *   .option("ids", "vid1,vid2,...")
  *   .option("numPartitions", "4")
  *   .load()
  * }}}
  *
  * Yields the raw transcript-row schema (video_id, start, duration,
  * text — graft.model.Schema.rawTranscript). This offline build
  * generates the same deterministic rows as StubTranscriptFetcher; a
  * production source swaps the row generation for the network client
  * while keeping the planning surface: ids are split across
  * `numPartitions` input partitions (each task fetches its slice) and
  * column pruning is pushed into the reader so unreferenced fields are
  * never materialized.
  */
class StubTranscriptSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stub-transcripts"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schema.rawTranscript
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StubTranscriptTable(schema)
}

class StubTranscriptTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "graft_stub_transcripts"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StubTranscriptScanBuilder(schema, options)
}

class StubTranscriptScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val ids = Option(options.get("ids"))
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val parts = math.max(1, Option(options.get("numPartitions"))
      .map(_.toInt).getOrElse(1))
    new StubTranscriptScan(required, ids, parts)
  }
}

case class TranscriptIdsPartition(ids: Array[String]) extends InputPartition

class StubTranscriptScan(required: StructType, ids: Seq[String], parts: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val groups = ids.zipWithIndex.groupBy(_._2 % parts)
    (0 until parts).flatMap { p =>
      groups.get(p).map(g => TranscriptIdsPartition(g.map(_._1).toArray))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new StubTranscriptReaderFactory(required)
}

class StubTranscriptReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new StubTranscriptReader(required,
      partition.asInstanceOf[TranscriptIdsPartition].ids)
}

/** Generates the stub's two segments per id, projecting only the
  * pruned columns (a production reader would fetch per id here, one
  * network client per partition). */
class StubTranscriptReader(required: StructType, ids: Array[String])
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[(String, Double, Double, String)] =
    ids.iterator.flatMap { id =>
      Iterator(
        (id, 0.0, 1.5, s"hello from $id."),
        (id, 1.5, 2.0, s"second segment of $id!"))
    }
  private var current: (String, Double, Double, String) = _

  // projection resolved ONCE per reader, not per row (scan hot path)
  private val extractors: Array[((String, Double, Double, String)) => Any] =
    required.fieldNames.map {
      case "video_id" => (r: (String, Double, Double, String)) => UTF8String.fromString(r._1)
      case "start" => (r: (String, Double, Double, String)) => r._2
      case "duration" => (r: (String, Double, Double, String)) => r._3
      case "text" => (r: (String, Double, Double, String)) => UTF8String.fromString(r._4)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(extractors.map(_.apply(current)).toIndexedSeq)

  override def close(): Unit = ()
}
