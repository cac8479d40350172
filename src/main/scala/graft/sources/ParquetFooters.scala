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

  /** Order-preserving small-file compaction plan — the maintenance step
    * that follows a [[footerStats]] audit: coalesce many small inputs
    * into ~`nGroups` rewrite groups of near-equal row mass WITHOUT
    * breaking the key order (inputs are packed in `input_id` order, so
    * each output group covers a contiguous key range and the layout's
    * min/max pruning survives the rewrite — the same contract as
    * `TrainPrep.packSequences`, applied to files instead of tokens).
    *
    * Input: one row per input file/bucket (`input_id`, `n_rows`) — i.e.
    * FOOTER data, never row data. Greedy first-fit by running total:
    * group = (rows before this input) div target, target = ceil(total /
    * nGroups). Deterministic and SQL-replayable (q168's oracle replays
    * the cumulative window in DuckDB).
    *
    * Scale: the window runs on ONE partition — but over one row per
    * input FILE (the same O(#files) control-plane cardinality the
    * driver's split enumeration already holds in memory). At 100 TB /
    * ~1 M files that is a single-task million-row window; beyond that,
    * plan per table partition (the outer `partitionBy` this function
    * deliberately leaves to the caller).
    */
  def compactionPlan(inputs: DataFrame, nGroups: Int): DataFrame = {
    require(nGroups >= 1, s"nGroups must be >= 1, got $nGroups")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cumBefore = coalesce(
      sum(col("n_rows")).over(Window.orderBy(col("input_id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val total = sum(col("n_rows")).over(Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    inputs
      .withColumn("__cum_before", cumBefore)
      .withColumn("__total", total)
      .withColumn("group_id",
        expr(s"__cum_before DIV ((__total + ${nGroups - 1}) DIV $nGroups)"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_inputs"), sum(col("n_rows")).as("total_rows"),
        min(col("input_id")).as("min_input"), max(col("input_id")).as("max_input"))
  }
}
