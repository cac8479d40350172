package graft.schema

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}

/** The 16-field silver transaction record (FIXTURES.md §2,
  * `/root/reference/etl/transformations/transactions.py:28-45`) as a
  * typed case class — compile-time field checks for transform-stage code
  * (SURVEY.md §1.1), while `DataFrame` remains the dynamic-schema
  * currency everywhere else.
  */
case class Transaction(
    checksum: String,
    etl_checksum: String,
    concept: String,
    amount: Double,
    account_number: String,
    bank: String,
    account_alias: String,
    currency: String,
    report_type: String,
    extraction_date: Timestamp,
    user_id: String,
    company_id: String,
    transaction_date: Date,
    reported_remaining: Double,
    created_at: String,
    metadata: Map[String, String])

object Transaction {
  /** Typed view of a silver frame (as produced by `Ingest.toSilver`). */
  def dataset(silver: DataFrame): Dataset[Transaction] = {
    val spark = silver.sparkSession
    import spark.implicits._
    silver.as[Transaction]
  }
}
