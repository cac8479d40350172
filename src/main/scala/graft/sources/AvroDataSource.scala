package graft.sources

import java.util

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 face of [[AvroSource]]: `spark.read.format("graft-avro")
  * .load(dir)` — the idiomatic way a user of the reference's Avro landing
  * zone consumes it from this engine (S3,
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
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)
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

private[sources] class AvroReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(p.asInstanceOf[AvroFilePartition].file, required)
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
