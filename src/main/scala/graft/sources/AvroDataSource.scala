package graft.sources

import java.util

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 face of [[AvroSource]]: `spark.read.format("graft-avro")
  * .load(dir)` and `df.write.format("graft-avro").mode(...).save(dir)` —
  * the idiomatic way a user of the reference's Avro landing zone consumes
  * and produces it from this engine (S3,
  * `/root/reference/etl/extraction/avro.py:6-17`).
  *
  * Scan shape: one `InputPartition` per container file (at production
  * layouts files ≈ HDFS blocks, so per-file granularity parallelizes the
  * same way Spark's own file sources do), schema inferred once from the
  * first container header on the driver. COLUMN PRUNING is pushed into
  * the record decode (`SupportsPushDownRequiredColumns`): Avro is
  * row-oriented, so the whole record is still read off disk, but only the
  * projected fields are converted to Catalyst values — for a wide
  * transaction envelope projected to 2 columns that skips most of the
  * conversion CPU, which dominates an Avro scan.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro: a load path is required"))
    AvroSource.toStructType(
      AvroSource.readAvroSchema(SparkSession.active, path))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema(), info.queryId())
}

private[sources] class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required)
}

private[sources] class AvroScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && s.getLen > 0 &&
          s.getPath.getName.endsWith(".avro")).map(_.getPath)
      else Array(p)
    files.sortBy(_.getName).map(f => AvroFilePartition(f.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
}

private[sources] case class AvroFilePartition(file: String) extends InputPartition

private[sources] case class AvroCommitMessage(file: String) extends WriterCommitMessage

private[sources] class AvroReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroFilePartition].file, required)
}

/** Write side of the v2 face: `df.write.format("graft-avro")
  * .mode("append" | "overwrite").save(dir)`. One container file per
  * partition, written to a hidden temp name and renamed on task commit to
  * `part-<partition>-<queryId>.avro` — the rename target is deterministic
  * per (partition, query), so a retried/speculative attempt is idempotent
  * (last committer wins), while distinct queries appending to the same
  * directory never collide.
  */
private[sources] class AvroWriteBuilder(path: String, schema: StructType,
    queryId: String) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(path, schema, queryId, doTruncate)
  }
}

private[sources] class AvroBatchWrite(path: String, schema: StructType,
    queryId: String, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side directory prep (same semantics as AvroSource.write)
    val out = new Path(path)
    val fs = out.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (truncate && fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    new AvroWriterFactory(path,
      AvroSource.toAvroSchema(schema, "graft_record").toString, schema, queryId)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class AvroWriterFactory(dir: String, schemaJson: String,
    struct: StructType, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(dir, schemaJson, struct, queryId, partitionId, taskId)
}

private[sources] class AvroDataWriter(dir: String, schemaJson: String,
    struct: StructType, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val schema = new Schema.Parser().parse(schemaJson)
  private val fs = new Path(dir).getFileSystem(new Configuration())
  private val tmp = new Path(dir, s".part-$partitionId-$queryId-attempt-$taskId.avro.tmp")
  private val dest = new Path(dir, s"part-$partitionId-$queryId.avro")
  private val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    .create(schema, fs.create(tmp, true))
  private val toScala = CatalystTypeConverters.createToScalaConverter(struct)

  override def write(row: InternalRow): Unit =
    writer.append(AvroSource.rowToRecord(
      toScala(row).asInstanceOf[Row], struct, schema))

  override def commit(): WriterCommitMessage = {
    writer.close()
    fs.delete(dest, false) // idempotent last-committer-wins
    fs.rename(tmp, dest)
    AvroCommitMessage(dest.toString)
  }

  override def abort(): Unit = { writer.close(); fs.delete(tmp, false): Unit }
  override def close(): Unit = ()
}

private[sources] class AvroPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val in = path.getFileSystem(new Configuration()).open(path)
  private val stream =
    new DataFileStream(in, new GenericDatumReader[GenericRecord]())
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (stream.hasNext) {
      // only the REQUIRED fields are converted — the pruning payoff
      current = toCatalyst(
        AvroSource.recordToRow(stream.next(), required)).asInstanceOf[InternalRow]
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
