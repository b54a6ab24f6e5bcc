package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming twin of `JsonPointSource`: a DataSource V2 `MicroBatchStream`
  * over the same observation feed — the engine-side analog of the
  * reference's hourly REST cadence (`weather_realtime_etl.py:29`, one fetch
  * per scheduler tick), completing the connector tier (batch read
  * `JsonPointSource`, batch sink `JsonLineSink`, now a streaming read).
  *
  * The offset IS the line index: `initialOffset` 0, `latestOffset` the
  * number of observations fetched so far, each micro-batch reads lines
  * `[start, end)`. Offsets serialize to the checkpoint log, so a restarted
  * query resumes at its committed line — spec-verified (a second run against
  * the same checkpoint reprocesses nothing). `SupportsAdmissionControl`
  * honors a `linesPerBatch` cap (surfaced as the default read limit), so a
  * backlog drains in bounded micro-batches exactly as maxOffsetsPerTrigger
  * does for Kafka, and `Trigger.AvailableNow` replays the feed through
  * MULTIPLE batches rather than one big one.
  *
  * Executor-side parsing reuses `JsonPointReaderFactory` — same pruned
  * columns, same strict null contract as the batch scan.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.JsonPointStreamSource")
  *     .option("payload", lines).option("linesPerBatch", "2").load()
  * }}}
  */
class JsonPointStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonPointSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val payload = Option(opts.get("payload")).getOrElse("")
    val perBatch = Option(opts.get("linesPerBatch")).map(_.toInt).getOrElse(Int.MaxValue)
    require(perBatch > 0, s"linesPerBatch must be positive, got $perBatch")
    new JsonPointStreamTable(payload, perBatch)
  }
}

private[sources] class JsonPointStreamTable(payload: String, perBatch: Int)
    extends Table with SupportsRead {
  override def name(): String = "graft_json_point_stream"
  override def schema(): StructType = JsonPointSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonPointStreamScanBuilder(payload, perBatch)
}

private[sources] class JsonPointStreamScanBuilder(payload: String, perBatch: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = JsonPointSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new JsonPointMicroBatchStream(
        payload.split('\n').filter(_.trim.nonEmpty), perBatch,
        required.fieldNames)
  }
}

/** Offset = count of lines already emitted (exclusive end). */
private[sources] case class LineOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class JsonPointMicroBatchStream(lines: Array[String],
    perBatch: Int, fields: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // the feed snapshot AvailableNow drains to; static payload ⇒ the full
  // line count, frozen at query start as the contract requires
  @volatile private var availableNowEnd: Long = lines.length.toLong

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = lines.length.toLong

  override def initialOffset(): Offset = LineOffset(0)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LineOffset].n
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => Long.MaxValue
    }
    LineOffset(math.min(availableNowEnd, math.min(Long.MaxValue - from, cap) + from))
  }

  override def getDefaultReadLimit: ReadLimit =
    if (perBatch == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(perBatch.toLong)

  /** The true end of the feed — lets Trigger.AvailableNow drain the backlog
    * across multiple rate-limited batches and then stop. */
  override def reportLatestOffset(): Offset = LineOffset(lines.length.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[LineOffset].n.toInt
    val to = end.asInstanceOf[LineOffset].n.toInt
    lines.slice(from, to).map(line => JsonPointPartition(line): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonPointReaderFactory(fields)

  override def deserializeOffset(json: String): Offset = LineOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
