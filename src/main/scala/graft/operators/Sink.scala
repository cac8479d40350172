package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.5, L1–L4 + T7).
  *
  * The reference's loads: a stubbed BigQuery insert (L1), a per-row
  * Pub/Sub JSON publish with client batching (L2/L3), and a logging
  * terminal (L4). Spark-shaped: partitioned parquet append (partition
  * columns = the reference's year/month/day/company_id GCS layout) and a
  * `to_json(struct(*))` message projection written as text lines —
  * per-partition buffered writes replace client-side batching.
  */
object Sink {

  /** L1 silver-table append, Hive-partitioned by company for partition
    * pruning on the ledger scan (S7) at read time.
    */
  def writeSilver(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("company_id")): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).parquet(path)

  /** T7 `prepare_for_pubsub` (`/root/reference/etl/loads/pubsub.py:19-42`):
    * drop `created_at` and `etl_checksum` (`:39-40`), serialize the row as
    * one JSON message.
    */
  def pubsubMessages(df: DataFrame): DataFrame =
    df.drop("created_at", "etl_checksum")
      .select(to_json(struct(col("*"))).as("message"))

  /** L2 `pubsub.push` batch form: JSON lines to a path (a Kafka-shaped
    * sink would swap the format string only).
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    pubsubMessages(df).write.mode("overwrite").text(path)

  /** L4 logging terminal (`/root/reference/src/utils.py:23-28`):
    * side-effect-free smoke — count survivors instead of per-row logs.
    */
  def logged(df: DataFrame): Long = df.count()

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Streaming appends and per-micro-batch
    * partitioned writes accumulate small files; at 100 TB the resulting
    * task-per-file scheduling and footer overhead dominate scans, so
    * compaction is a first-class maintenance operator.
    *
    * File count is derived from the directory's ON-DISK size (Hadoop FS
    * listing, not a data scan); the rewrite itself is one pass with a
    * round-robin repartition — no shuffle key needed, output files are
    * near-uniform. Writes to `outPath` (atomic swap is the caller's
    * rename: rewriting in place would lose data on job failure).
    */
  def compact(df: DataFrame, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(inPath != outPath,
      "compact: refusing in-place rewrite — write to a new path, then rename")
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
