package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK — the write-side twin of `JsonPointSource`,
  * demonstrating the full batch commit protocol a distributed sink needs:
  * every task writes its partition to a hidden staging file and reports it
  * in a `WriterCommitMessage`; only the driver-side `BatchWrite.commit`
  * publishes the staged files by atomic rename, and `abort` deletes them —
  * so a failed or speculatively-duplicated task can never leave partial
  * output visible. That staging/publish split is exactly the contract
  * object-store writers implement at scale; here the medium is a local
  * directory and the format is JSON lines (re-readable by `spark.read
  * .json`, see `q_dsv2_sink`).
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.JsonLineSink")
  *     .option("path", "/tmp/out").mode("append").save()
  * }}}
  */
class JsonLineSink extends TableProvider {
  // write-only source: Spark hands us the DataFrame's schema
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft.sources.JsonLineSink is write-only; read back with spark.read.json")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("JsonLineSink requires a path option"))
    new JsonLineTable(path, schema)
  }
}

private[sources] class JsonLineTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_jsonl_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonLineWriteBuilder(path, info.schema())
}

private[sources] class JsonLineWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  // df.write.mode("overwrite") plans a truncate + write
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new JsonLineBatchWrite(path, schema, doTruncate)
  }
}

/** One staged-file path per successful task. */
private[sources] case class StagedFile(path: String) extends WriterCommitMessage

private[sources] class JsonLineBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    new JsonLineWriterFactory(path, schema)
  }

  /** Publish: for overwrite, delete the PRE-EXISTING visible files first —
    * here, not at job start, so a failed or aborted overwrite leaves the old
    * data untouched (deleting in `createBatchWriterFactory` would empty the
    * destination before a single task had committed). Then rename every
    * staged file to its visible name. Both steps run once, on the driver,
    * after all tasks succeeded; a driver crash BETWEEN individual renames
    * can still expose a partial mix — per-file rename is atomic, the
    * multi-file publish is not, the same caveat every file-listing committer
    * carries. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate) {
      val listing = Files.list(Paths.get(path))
      try {
        listing.filter(p => !p.getFileName.toString.startsWith("_staged_"))
          .forEach(p => Files.deleteIfExists(p))
      } finally listing.close()
    }
    messages.foreach { case StagedFile(staged) =>
      val p = Paths.get(staged)
      Files.move(p, p.resolveSibling(p.getFileName.toString.stripPrefix("_staged_")),
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case StagedFile(staged) => Files.deleteIfExists(Paths.get(staged))
      case _ => ()
    }
}

private[sources] class JsonLineWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonLineDataWriter(path, schema, partitionId, taskId)
}

private[sources] class JsonLineDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  // staging name carries the task id: two speculative attempts of the same
  // partition stage DIFFERENT files, and only the committed attempt's
  // message reaches BatchWrite.commit
  private val staged: Path =
    Paths.get(path, f"_staged_part-$partitionId%05d-task-$taskId.jsonl")
  private val out = Files.newBufferedWriter(staged, StandardCharsets.UTF_8)
  private val mapper = new ObjectMapper()

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case LongType => node.put(f.name, row.getLong(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case other => throw new UnsupportedOperationException(
          s"JsonLineSink: unsupported type ${other.sql} for column ${f.name}")
      }
    }
    out.write(node.toString)
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(staged.toString)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(staged)
  }

  override def close(): Unit = ()
}
