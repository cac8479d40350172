package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-atomic versioned parquet ledger (round 13 — closes the one
  * spot where the repo's documented production contract and shipped
  * mechanism differed: the streaming state ops persisted their ledgers
  * as in-place parquet `overwrite`, whose delete-then-write window can
  * lose the ledger to a mid-commit crash; the scaladocs said
  * "production swaps a table-format version"). This IS that version
  * swap, on nothing but the Hadoop FileSystem API, so it works on
  * local, HDFS and object stores with atomic metadata rename alike:
  *
  * {{{
  *   <path>/v0/ <path>/v1/ ... <path>/vN/   // immutable snapshot dirs
  *   <path>/CURRENT                          // one-line pointer: "N"
  * }}}
  *
  * A commit (1) writes the full snapshot to the NEXT version dir —
  * nothing reads it yet, so a crash here is invisible; then (2) writes
  * the pointer to a temp file and swaps it over `CURRENT` with
  * `FileContext.rename(..., Rename.OVERWRITE)` — the same atomic-rename
  * primitive Spark's own streaming metadata log relies on. Readers
  * resolve `CURRENT` first, so they see either the old snapshot or the
  * new one, never a partial delete. A writer killed between (1) and (2)
  * leaves an orphan `v{N+1}` dir that the recovered writer simply
  * rewrites (mode `overwrite` on a dir no pointer references) — the
  * StreamingSpec crash-simulation case pins exactly this.
  *
  * GC keeps the current AND previous snapshot (a reader that resolved
  * the pointer just before a swap may still be scanning N-1; production
  * table formats keep snapshots for the same reason) and best-effort
  * deletes anything older. Single-writer by contract — `foreachBatch`
  * serializes triggers, which is the only writer these ledgers have.
  */
object VersionedLedger {

  private val Pointer = "CURRENT"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointerLines(spark: SparkSession, path: String): Seq[String] = {
    val ptr = new Path(path, Pointer)
    val f = fs(spark, ptr)
    if (!f.exists(ptr)) Seq.empty
    else {
      val in = f.open(ptr)
      try {
        val br = new java.io.BufferedReader(new java.io.InputStreamReader(
          in, java.nio.charset.StandardCharsets.UTF_8))
        Iterator.continually(br.readLine()).takeWhile(_ != null).toSeq
      } finally in.close()
    }
  }

  /** The committed version, if any commit ever completed. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    pointerLines(spark, path).headOption.map(_.trim.toLong)

  /** The streaming batch id recorded with the last commit, if the
    * committer supplied one — the replay fence for at-least-once
    * `foreachBatch` sinks (round 14): a non-idempotent merge (e.g. the
    * media-health cumulative counters) must no-op when Spark re-runs a
    * batch whose effect the ledger already holds. The id rides in the
    * SAME pointer file the version does, so it swaps in atomically
    * with the snapshot it describes.
    */
  def lastAppliedBatch(spark: SparkSession, path: String): Option[Long] =
    pointerLines(spark, path).drop(1).headOption.map(_.trim.toLong)

  /** The run tag recorded with the last commit (round 15 — the checkpoint
    * lineage the batch id belongs to). Batch ids restart at 0 for every
    * NEW checkpoint, so a batch-id-only fence cannot tell a re-delivered
    * batch (same query lineage, crash between ledger commit and Spark's
    * checkpoint commit) from the first batches of a legitimately new
    * stream run reusing the ledger — and would silently DISCARD the new
    * run's data. The streaming query's stable id (persisted in the
    * checkpoint, so it survives restarts of the same lineage but differs
    * for a fresh checkpoint) rides as a third pointer line; callers fence
    * only when BOTH the tag and the batch id match. Pre-round-15 ledgers
    * carry no tag line — [[None]], which callers treat as
    * matching-any-run (the documented legacy batch-id-only behavior).
    */
  def lastAppliedRun(spark: SparkSession, path: String): Option[String] =
    pointerLines(spark, path).drop(2).headOption.map(_.trim).filter(_.nonEmpty)

  /** One fence decision for at-least-once `foreachBatch` merges: has
    * `(runTag, batchId)`'s effect already been committed? True only when
    * the recorded batch id covers `batchId` AND the recorded run tag
    * matches (a ledger without a tag — pre-upgrade — fences on batch id
    * alone, documented legacy). A DIFFERENT run tag never fences: a new
    * checkpoint lineage restarts batch ids at 0 with genuinely new data.
    *
    * Legacy-pointer caveat (round 16 — the `forall`-on-`None` edge): a
    * ledger whose pointer was written BEFORE the run-tag line existed
    * stays bound to its ORIGINAL lineage until the first post-upgrade
    * commit — its tagless pointer fences on batch id alone, so pointing
    * a FRESH checkpoint (batch ids restarting at 0) at such a ledger
    * discards the new lineage's first `lastAppliedBatch + 1` batches
    * exactly as the pre-round-15 fence did. Operationally: retire a
    * legacy ledger's pointer with one tagged commit (any batch) before
    * re-homing it to a new checkpoint; every commit made through the
    * round-15+ streaming faces writes the tag, so the window closes on
    * first contact. LedgerSpec pins the behavior with a hand-written
    * two-line pointer.
    */
  def alreadyApplied(spark: SparkSession, path: String, runTag: String,
      batchId: Long): Boolean =
    lastAppliedBatch(spark, path).exists(_ >= batchId) &&
      lastAppliedRun(spark, path).forall(_ == runTag)

  /** Last committed snapshot, or None before the first commit. */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    currentVersion(spark, path).map(v => spark.read.parquet(s"$path/v$v"))

  /** Like [[read]] but falls back to reading `path` as a plain parquet
    * dir when no pointer exists — accepts both a versioned ledger and a
    * one-shot plain dump (the drift reference was historically the
    * latter; refits should move to [[commit]] for atomicity).
    */
  def readOrPlain(spark: SparkSession, path: String): Option[DataFrame] =
    currentVersion(spark, path) match {
      case Some(v) => Some(spark.read.parquet(s"$path/v$v"))
      case None =>
        val p = new Path(path)
        if (fs(spark, p).exists(p)) Some(spark.read.parquet(path)) else None
    }

  /** Commit half 1 — write the snapshot dir. Exposed (with
    * [[swapPointer]]) so the crash-simulation spec can kill the writer
    * between the two halves; callers use [[commit]].
    */
  def writeVersion(df: DataFrame, path: String, version: Long): Unit =
    df.write.mode("overwrite").parquet(s"$path/v$version")

  /** Commit half 2 — atomically swap the pointer to `version` via
    * temp-file + `FileContext.rename(OVERWRITE)`. `batchId`, when
    * present, is recorded as a second pointer line (see
    * [[lastAppliedBatch]]); `runTag`, when present, as a third (see
    * [[lastAppliedRun]] — run tags must be single-line and non-empty
    * to round-trip).
    */
  def swapPointer(spark: SparkSession, path: String, version: Long,
      batchId: Option[Long] = None, runTag: Option[String] = None): Unit = {
    require(runTag.forall(t => t.nonEmpty && !t.contains("\n")),
      s"swapPointer: run tag must be non-empty and single-line, got $runTag")
    require(batchId.isDefined || runTag.isEmpty,
      "swapPointer: runTag rides as the THIRD pointer line, after the " +
        "batch id — passing runTag without batchId would silently drop it")
    val dir = new Path(path)
    val f = fs(spark, dir)
    if (!f.exists(dir)) f.mkdirs(dir)
    val tmp = new Path(dir, s".$Pointer.tmp-${version}")
    val out = f.create(tmp, true)
    val body = version.toString + batchId.map(b => s"\n$b").getOrElse("") +
      batchId.flatMap(_ => runTag).map(t => s"\n$t").getOrElse("")
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(dir.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(dir, Pointer), Options.Rename.OVERWRITE)
  }

  /** Atomic full-snapshot commit; returns the committed version. */
  def commit(df: DataFrame, path: String, batchId: Option[Long] = None,
      runTag: Option[String] = None): Long = {
    val spark = df.sparkSession
    val next = currentVersion(spark, path).map(_ + 1L).getOrElse(0L)
    writeVersion(df, path, next)
    swapPointer(spark, path, next, batchId, runTag)
    // best-effort GC: keep current + previous (an in-flight reader may
    // still be scanning N-1), drop older snapshots and orphan tmp files
    try {
      val dir = new Path(path)
      val f = fs(spark, dir)
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
            n.drop(1).toLong < next - 1L)
          f.delete(st.getPath, true)
      }
    } catch { case _: java.io.IOException => () }
    next
  }
}
