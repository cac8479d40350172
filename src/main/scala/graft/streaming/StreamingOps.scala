package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming operators (SURVEY.md §2.3 F3/F4, §2.7).
  *
  * The reference's cross-process dedup is a Redis set + 5s TTL locks
  * (`/root/reference/src/redis_tools.py:15-54`); the principled Spark form
  * is the streaming state store: exactly-once micro-batches subsume the
  * lock, the watermark subsumes the TTL. All ops here work on any frame
  * with the `events` shape (event_id, ts, user_id, event_type, value) and
  * are used both on `readStream` sources and (for oracle checks) batch
  * frames — the transformations are identical by construction.
  */
object StreamingOps {

  /** F3/F4: first-writer-wins dedup with bounded state — late duplicates
    * beyond the watermark age out of the store (the TTL analog).
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Unbounded-state exact streaming dedup (reference semantics: the Redis
    * set never expires).
    */
  def dedupExact(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicates(keyCols)

  /** §2.7 streaming generalization of the per-batch counters: tumbling
    * window counts/sums per event_type.
    */
  def tumblingCounts(events: DataFrame, tsCol: String, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user: built-in `session_window` with a gap —
    * the streaming twin of the batch sessionize query.
    */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))
}
