package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-fill analytics (SURVEY.md §2.7): windows, top-k, sessionization,
  * and skew-aware aggregation. The reference has none of these (row
  * counts via `len()` only); they generalize its per-batch counters and
  * `reported_remaining` reconciliation intent.
  */
object Analytics {

  /** Running balance: partitioned cumulative sum in exact decimal
    * (`sum(amount) over` — the reference stores `reported_remaining` per
    * line precisely so balances can be checked, SURVEY.md §2.7).
    */
  def runningSum(df: DataFrame, partition: Seq[String], order: Seq[Column],
      value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(value.cast("decimal(18,2)")).over(w).cast("double"))
  }

  /** Latest record per key — the rank flavor of F3 dedup. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    Dedup.firstWriterWins(df, keys, order)

  /** Top-k by an ordering, deterministic via unique tie-breakers. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Gap-based sessionization: a new session starts when the time since
    * the previous event (per key) exceeds `gapMicros`. Exact integer
    * timestamp arithmetic end to end.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("__ts_us", unix_micros(col(tsCol)))
      .withColumn("__prev_us", lag(col("__ts_us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev_us").isNull || col("__ts_us") - col("__prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__ts_us", "__prev_us", "__new")
  }

  /** Skew-aware aggregation: two-phase salted hash aggregate.
    *
    * A hot key at 100 TB puts one reducer partition orders of magnitude
    * above the rest; salting splits each key into `saltBuckets` partial
    * groups (deterministic salt from a payload hash — no rand(), results
    * stay reproducible), aggregates partially, then merges. Only
    * decomposable aggregates belong here (sum/count/min/max); Spark's
    * partial aggregation handles mild skew already — this is for the
    * pathological tail, alongside AQE's skew-join splitting.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
      saltFrom: Column, saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(saltFrom), lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value.cast("decimal(18,2)")).as("__psum"), count(lit(1)).as("__pn"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(as), sum(col("__pn")).as(s"${as}_n"))
  }
}
