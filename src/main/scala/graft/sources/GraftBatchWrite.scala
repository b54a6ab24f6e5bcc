package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** The DISTRIBUTED write path for manifest tables (the V2 counterpart of
  * the staging the V1 insert bridge does through `DataFrame.write`):
  * every task writes its partition's rows straight into the table's
  * `data/` directory under a unique name — an invisible ORPHAN until a
  * manifest lists it, exactly the staging contract — and sends the file
  * name back as its commit message. The DRIVER turns the collected names
  * into manifest lines (harvesting footer stats for the table's stats
  * columns) and publishes ONE CAS commit. A failed/speculative task's
  * file stays an orphan for vacuum; nothing is ever visible early.
  *
  * Writing uses the same parquet-mr Group API the catalog's reader
  * decodes with (`ManifestParquetReader`) — schema round-trip is by
  * construction, and the supported type set is identical. */
private[sources] object GraftBatchWrite {

  /** StructType → parquet MessageType (all fields optional, matching the
    * nullable rows Spark hands a writer). */
  def messageType(schema: StructType, name: String = "spark_schema"): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.optional(PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => b.optional(PrimitiveTypeName.INT32).named(f.name)
        case DoubleType => b.optional(PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => b.optional(PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => b.optional(PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType => b.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType => b.optional(PrimitiveTypeName.BINARY).named(f.name)
        case DateType => b.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType => b.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(f.name)
        case TimestampNTZType => b.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(f.name)
        case dt => throw new IllegalArgumentException(
          s"unsupported write type $dt for column ${f.name}")
      }
    }
    b.named(name)
  }
}

private[sources] case class GraftFileCommit(name: String, rows: Long)
    extends WriterCommitMessage

private[sources] class GraftWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftParquetDataWriter(dir, schema, partitionId, taskId)
}

private[sources] class GraftParquetDataWriter(dir: String,
    schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // unique per (partition, task attempt): speculative or retried attempts
  // never collide, and losers stay orphans
  private val name =
    s"w-${java.util.UUID.randomUUID().toString.take(8)}-p$partitionId-t$taskId.parquet"
  private val mt = GraftBatchWrite.messageType(schema)
  private val conf = new Configuration()
  GroupWriteSupport.setSchema(mt, conf)
  private val writer: ParquetWriter[Group] =
    ExampleParquetWriter.builder(new Path(s"$dir/data/$name"))
      .withConf(conf).build()
  private val factory = new SimpleGroupFactory(mt)
  private var rows = 0L

  override def write(r: InternalRow): Unit = {
    // row-level (ReplaceData) writes PREPEND Spark's `__row_operation`
    // int column; group-based replacements only ever emit write-flavored
    // rows, but a delete-flavored one must be dropped, never persisted
    val off = r.numFields - schema.length
    if (off != 0 && off != 1) throw new IllegalStateException(
      s"write row has ${r.numFields} fields, schema has ${schema.length}: " +
        schema.fieldNames.mkString(","))
    if (off == 1 && r.getInt(0) ==
        org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION)
      return
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!r.isNullAt(i + off)) {
        val n = schema(i).name
        schema(i).dataType match {
          case LongType | TimestampType | TimestampNTZType =>
            g.add(n, r.getLong(i + off))
          case IntegerType | DateType => g.add(n, r.getInt(i + off))
          case DoubleType => g.add(n, r.getDouble(i + off))
          case FloatType => g.add(n, r.getFloat(i + off))
          case BooleanType => g.add(n, r.getBoolean(i + off))
          case StringType => g.add(n, r.getUTF8String(i + off).toString)
          case BinaryType => g.add(n,
            org.apache.parquet.io.api.Binary.fromConstantByteArray(
              r.getBinary(i + off)))
          case dt => throw new IllegalArgumentException(s"unsupported $dt")
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftFileCommit(name, rows)
  }

  override def abort(): Unit = {
    writer.close()
    // best effort: remove the aborted attempt's orphan now (vacuum would
    // collect it anyway)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir, "data", name))
    ()
  }

  override def close(): Unit = ()
}

/** Streaming flavor of [[GraftWriterFactory]] — a top-level class so the
  * serialized factory carries only (dir, schema), never a closure over
  * the driver-side write machinery. */
private[sources] class GraftStreamingWriterFactory(dir: String,
    schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftParquetDataWriter(dir, schema, partitionId, taskId)
}
