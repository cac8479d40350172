package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed Avro object-container read/write (S3 — the reference's
  * actual landing format: it downloads a blob and iterates
  * `fastavro.reader` records, `/root/reference/etl/extraction/avro.py:6-17`).
  *
  * The container ships Avro core + avro-mapred (they are Spark runtime
  * dependencies) but NOT the spark-avro connector module, so this is a
  * from-scratch source on the PUBLIC Avro and Hadoop APIs:
  *
  *  - '''read''': `sparkContext.hadoopFile` with Avro's own
  *    `AvroInputFormat` — container files are splittable on their sync
  *    markers, so one 10 GB object fans out across executors as ordinary
  *    input splits (the reference streams each blob single-threaded).
  *    Records convert to `Row`s inside the scan iterator (the record
  *    reader reuses its wrapper object — nothing Avro-mutable escapes a
  *    partition). Schema comes from the first file's header, read once on
  *    the driver — the same self-describing-header contract fastavro
  *    relies on.
  *  - '''write''': one Avro container file per partition via
  *    `DataFileWriter` against the Hadoop filesystem — a distributed sink
  *    with the same part-file layout as Spark's own file sinks. Empty
  *    partitions still write a records-less container so the schema
  *    always round-trips (an all-empty frame stays readable).
  *
  * Type subset (documented contract, enforced loudly): string, int, long,
  * float, double, boolean, bytes, date (int/`date`), timestamp
  * (long/`timestamp-micros`), timestamp_ntz (long/`local-timestamp-micros`),
  * decimal (bytes/`decimal` or fixed/`decimal` → `DecimalType(p,s)` —
  * the payments-shaped silver amount, SURVEY.md §1.3's DECIMAL(18,2)),
  * arrays, string-keyed maps, nested records,
  * and nullability via `union(null, T)`. That covers the reference's
  * transaction envelope; anything else throws at schema conversion rather
  * than corrupting values.
  */
object AvroSource {

  // ---- schema mapping -----------------------------------------------

  /** Avro record schema → Catalyst. */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"AvroSource: top-level schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toCatalyst(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  private def toCatalyst(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size != nonNull.size,
        s"AvroSource: only union(null, T) unions are supported, got $s")
      (toCatalyst(nonNull.head)._1, true)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) (TimestampType, false)
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros]) (TimestampNTZType, false)
      else (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES => s.getLogicalType match {
      case dec: LogicalTypes.Decimal =>
        (DecimalType(dec.getPrecision, dec.getScale), false)
      case _ => (BinaryType, false)
    }
    case Schema.Type.FIXED => s.getLogicalType match {
      case dec: LogicalTypes.Decimal =>
        (DecimalType(dec.getPrecision, dec.getScale), false)
      case _ => throw new IllegalArgumentException(
        s"AvroSource: fixed without a decimal logical type is unsupported: $s")
    }
    case Schema.Type.ARRAY =>
      val (et, en) = toCatalyst(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toCatalyst(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD => (toStructType(s), false)
    case t => throw new IllegalArgumentException(
      s"AvroSource: unsupported Avro type $t in $s")
  }

  /** Catalyst → Avro record schema (nullable fields become
    * union(null, T) with a null default, Avro's idiomatic optional).
    */
  def toAvroSchema(struct: StructType, recordName: String): Schema = {
    val fields = struct.fields.map { f =>
      val base = toAvro(f.dataType, s"${recordName}_${f.name}")
      val sch = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) org.apache.avro.JsonProperties.NULL_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def toAvro(dt: DataType, nestedName: String): Schema = dt match {
    case StringType  => Schema.create(Schema.Type.STRING)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case d: DecimalType =>
      // bytes + decimal(p,s): the variable-width form every Avro reader
      // supports (fixed/decimal is accepted on read, never written)
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      val el = toAvro(et, s"${nestedName}_item")
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), el)) else el)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvro(vt, s"${nestedName}_value")
      Schema.createMap(if (valueContainsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), v)) else v)
    case st: StructType => toAvroSchema(st, nestedName)
    case t => throw new IllegalArgumentException(
      s"AvroSource: unsupported Catalyst type $t")
  }

  // ---- value conversion ----------------------------------------------

  private def avroToSql(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: ByteBuffer, BinaryType) =>
      // the buffer is reader-owned and reused — copy out
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (b: Array[Byte], BinaryType) => b.clone()
    case (b: ByteBuffer, d: DecimalType) =>
      // decimal(p,s) over bytes: two's-complement big-endian unscaled value
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out)
      new java.math.BigDecimal(new java.math.BigInteger(out), d.scale)
    case (f: org.apache.avro.generic.GenericFixed, d: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), d.scale)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        Math.floorMod(l.longValue(), 1000000L) * 1000L))
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        (Math.floorMod(l.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (x, IntegerType | LongType | FloatType | DoubleType | BooleanType) => x
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.map(avroToSql(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) =>
        k.toString -> avroToSql(mv, vt)
      }.toMap
    case (r: GenericRecord, st: StructType) => recordToRow(r, st)
    case (x, t) => throw new IllegalArgumentException(
      s"AvroSource: cannot convert ${x.getClass} to $t")
  }

  private[sources] def recordToRow(rec: GenericRecord, struct: StructType): Row =
    Row.fromSeq(struct.fields.map(f => avroToSql(rec.get(f.name), f.dataType)).toSeq)

  private def sqlToAvro(v: Any, dt: DataType, schema: Schema): Any = {
    val target = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    (v, dt) match {
      case (null, _) => null
      case (s: String, StringType) => s
      case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
      case (x: java.math.BigDecimal, d: DecimalType) =>
        // rescale exactly to the schema's scale (throws on precision loss
        // rather than silently rounding), then emit the unscaled bytes
        ByteBuffer.wrap(x.setScale(d.scale).unscaledValue().toByteArray)
      case (x: scala.math.BigDecimal, d: DecimalType) =>
        ByteBuffer.wrap(x.underlying.setScale(d.scale).unscaledValue().toByteArray)
      case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
      case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
      case (t: java.sql.Timestamp, TimestampType) =>
        val i = t.toInstant
        Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
      case (t: java.time.Instant, TimestampType) =>
        Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L)
      case (t: java.time.LocalDateTime, TimestampNTZType) =>
        Math.addExact(Math.multiplyExact(
          t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L), t.getNano / 1000L)
      case (x, IntegerType | LongType | FloatType | DoubleType | BooleanType) => x
      case (a: scala.collection.Seq[_], ArrayType(et, _)) =>
        a.map(sqlToAvro(_, et, target.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, mv) =>
          k.toString -> sqlToAvro(mv, vt, target.getValueType)
        }.asJava
      case (r: Row, st: StructType) => rowToRecord(r, st, target)
      case (x, t) => throw new IllegalArgumentException(
        s"AvroSource: cannot convert ${x.getClass} to Avro $t")
    }
  }

  private[sources] def rowToRecord(row: Row, struct: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    struct.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name,
        sqlToAvro(row.get(i), f.dataType, schema.getField(f.name).schema()))
    }
    rec
  }

  // ---- read ------------------------------------------------------------

  /** Schema of the first container file under `path` (driver-side header
    * read — a few KB, never the data blocks).
    */
  def readAvroSchema(spark: SparkSession, path: String): Schema = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && s.getLen > 0)
          .map(_.getPath).sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(
            s"AvroSource: no files under $path"))
      else p
    val in = fs.open(file)
    try new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
    finally in.close()
  }

  /** Read a directory (or single file) of Avro container files as a
    * DataFrame. Splittable, executor-parallel, schema from the header.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val struct = toStructType(readAvroSchema(spark, path))
    val globbed =
      // AvroInputFormat lists *.avro only when given a bare dir? No — it
      // filters nothing; glob explicitly so stray _SUCCESS files don't
      // break record decoding.
      if (path.endsWith(".avro")) path else s"$path/*.avro"
    val rows = spark.sparkContext
      .hadoopFile[AvroWrapper[GenericRecord], NullWritable, AvroInputFormat[GenericRecord]](globbed)
      .mapPartitions(_.map { case (w, _) => recordToRow(w.datum(), struct) })
    spark.createDataFrame(rows, struct)
  }

  // ---- write -----------------------------------------------------------

  /** Write `df` as one Avro container file per partition under `dir`
    * (overwrite semantics). Runs on the executors; the driver only
    * prepares the directory.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val struct = df.schema
    val schemaJson = toAvroSchema(struct, "graft_record").toString
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val part = new Path(s"$dir/part-%05d.avro".format(pid))
      // executor-side: default Hadoop configuration (local/HDFS defaults);
      // the container file is written streaming, one pass
      val pfs = part.getFileSystem(new Configuration())
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        .create(schema, pfs.create(part, true))
      try it.foreach(row => w.append(rowToRecord(row, struct, schema)))
      finally w.close()
      Iterator.single(1)
    }.count(): Unit
  }
}
