package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Footer-only parquet statistics — the table-maintenance primitive
  * behind stats-based file skipping, compaction planning, and layout
  * audits (companions: q116 layout cost, q139 Z-order bounding boxes,
  * q149 encoding advisor — all of which derive layout stats from DATA;
  * this reads what the writer already persisted in METADATA).
  *
  * Reads each file's parquet FOOTER only: per row group, the row count
  * and the min/max statistics of one INT64 column. No data page is ever
  * touched — at 100 TB the audit costs one ~KB-sized tail read per
  * file, which is why engines plan against footers in the first place.
  * The q153 oracle closes the loop: footer-derived per-bucket
  * (count, min, max) must equal the same aggregates computed FROM the
  * data by DuckDB — i.e. the stats the scan planner would prune on are
  * proven consistent with the rows.
  *
  * Distribution: the file LISTING is a driver-side control-plane read
  * (bounded by file count, same budget as every query planner's split
  * enumeration); footer decoding runs distributed via parallelize over
  * the path list. Uses the parquet-mr classes Spark itself ships —
  * public API, no extra dependency.
  */
object ParquetFooters {

  private val schema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("row_group", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("min_v", LongType, nullable = true),
    StructField("max_v", LongType, nullable = true)))

  /** Per-row-group footer stats for every `*.parquet` file under `dir`
    * (recursive — partitioned layouts keep files in `key=value/`
    * subdirs). `column` must be a physical INT64 leaf. */
  def footerStats(spark: SparkSession, dir: String, column: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val paths: Seq[String] =
      if (!fs.exists(root)) Seq.empty
      else {
        val it = fs.listFiles(root, true)
        val buf = Seq.newBuilder[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.getName.endsWith(".parquet"))
            buf += f.getPath.toString
        }
        buf.result()
      }
    val slices = math.max(1, math.min(paths.size, 32))
    // ship the SESSION Hadoop conf to executors (Configuration itself is
    // not serializable — SerializableConfiguration is Spark's own wrapper
    // for exactly this): a vanilla `new Configuration()` on the executor
    // would drop credentials / FS bindings and break footer reads on
    // object stores (s3a, abfs) or kerberized HDFS
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    val rows = spark.sparkContext.parallelize(paths, slices).mapPartitions { it =>
      val conf = bcConf.value.value
      it.flatMap { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(p), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).map { i =>
            val b = blocks.get(i)
            val chunk = (0 until b.getColumns.size())
              .map(b.getColumns.get(_))
              .find(_.getPath.toDotString == column)
              .getOrElse(throw new IllegalArgumentException(
                s"column $column not found in $p"))
            val stats = chunk.getStatistics
            val (mn, mx): (java.lang.Long, java.lang.Long) =
              if (stats == null || !stats.hasNonNullValue) (null, null)
              else (stats.genericGetMin.asInstanceOf[java.lang.Long],
                stats.genericGetMax.asInstanceOf[java.lang.Long])
            Row(p, i, b.getRowCount, mn, mx)
          }
        } finally reader.close()
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
