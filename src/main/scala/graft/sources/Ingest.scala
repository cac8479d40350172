package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** Scans / sources (SURVEY.md §2.1, S1–S7).
  *
  * The reference's extraction is a BigQuery SQL string with a triple
  * UNNEST (`/root/reference/etl/extraction/bigquery.py:19-46`); here the
  * same shape is a parquet scan + `explode` chain, with partition pruning,
  * column pruning and file pruning left to Catalyst.
  */
object Ingest {

  /** Load one driver testdata table (TESTDATA.md).
    *
    * Small-file parallelism fix: the testdata tables are single parquet
    * files with ONE row group, so the scan is a single task — and Spark
    * fuses every narrow transform (md5, date parsing, tokenization) into
    * that scan stage, serializing the whole map side onto one core of
    * local[32]. When the scan's split count is far below the session's
    * parallelism, a round-robin repartition (one ~10 MB shuffle) unlocks
    * the other cores. At production scale a table has orders of magnitude
    * more splits than cores, the condition never fires, and reads stay
    * shuffle-free — this is purely a small-input adaptation.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** Load a table destined for a broadcast build side (dimension role).
    * Skips [[table]]'s fan-out repartition: a broadcast input is collected
    * to the driver whole, so a pre-shuffle is pure overhead (it showed up
    * as an extra Exchange under every BroadcastExchange in q00/q19).
    */
  def dim(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Load the `events` table, normalizing `ts` to a session-TZ TIMESTAMP
    * regardless of how the fixture writer encoded it. The driver testdata
    * has shipped `ts` in two physical forms across rounds —
    * TIMESTAMP(NANOS) (which vanilla Spark rejects with
    * [PARQUET_TYPE_ILLEGAL] unless surfaced as BIGINT nanos via the
    * legacy conf) and plain timestamp[us] — so the loader branches on the
    * footer schema instead of assuming one:
    *  - LongType        → BIGINT nanos from the legacy conf; integer DIV
    *                      to micros is lossless (values carry µs precision).
    *  - TimestampType   → already what every consumer and the DuckDB
    *                      oracle's `CAST(ts AS TIMESTAMP)` expect.
    *  - TimestampNTZType→ cast to TIMESTAMP; the session timezone is
    *                      pinned UTC so the wall-clock values are identical.
    * Any other type fails loudly with the observed schema — a third drift
    * should break ONE readable assertion, not sixteen queries downstream.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType    => df
      case TimestampNTZType =>
        // the NTZ→TIMESTAMP cast reinterprets wall-clock values in the
        // SESSION timezone — lossless only when that is UTC. Bench/Verify
        // pin it; fail loudly for an ad-hoc session that didn't (advice
        // r9) instead of silently shifting every event time.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ: reading it requires spark.sql.session.timeZone=UTC " +
            s"(got '$tz') or every event time would shift by the zone offset")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected BIGINT nanos, TIMESTAMP or TIMESTAMP_NTZ); " +
          s"full schema: ${df.schema.treeString}")
    }
  }

  /** S5 partition-path parser (`/root/reference/src/utils.py:12-20`):
    * `year=2024/month=11/day=24/company_id=X/f.avro` → MAP(k→v).
    * Pure `str_to_map` on `/` pairs and `=` key-values; the trailing
    * filename segment has no `=` so it lands as a null-valued key that
    * partition lookups never touch (a regex pre-strip measured ~40% of
    * the parse cost at 600k rows).
    */
  def parsePartitionPath(path: Column): Column =
    str_to_map(path, lit("/"), lit("="))

  /** S6 filename metadata extraction (`/root/reference/test.py:17`):
    * regex capture groups over a file path column.
    */
  def extractPathField(path: Column, pattern: String, group: Int): Column =
    regexp_extract(path, pattern, group)

  /** S1/S2 flatten: bronze (nested, FIXTURES.md §1) → one row per line.
    * `UNNEST(payload)` / `UNNEST(payload.lines)` ≡ two `explode`s.
    * The third UNNEST (metadata) is deliberately NOT performed: the
    * reference exploded metadata and then rebuilt the dict with a shared
    * mutable object (the Q4 accumulation bug, `transactions.py:11,44`);
    * keeping `line.metadata` intact gives the intended per-transaction
    * map for free (SURVEY.md Q4 resolution).
    */
  def flattenBronze(bronze: DataFrame): DataFrame =
    bronze
      .select(col("userId"), col("companyId"), explode(col("payload")).as("p"))
      .select(col("userId"), col("companyId"), col("p.header").as("header"),
        explode(col("p.lines")).as("line"))

  /** T1 projection: flattened bronze → 16-field silver record
    * (FIXTURES.md §2, `transactions.py:28-45`). Q4 fixed via
    * `map_from_entries` on the intact metadata array; Q5's
    * userId/companyId pass-through implemented as intended.
    */
  def toSilver(flat: DataFrame): DataFrame = {
    import Transforms._
    flat.select(
      col("line.checksum").as("checksum"),
      etlChecksum(
        normalizeDateString(col("line.date")),
        col("line.concept"),
        centsString(col("line.amount")),
        centsString(col("line.remaining"))).as("etl_checksum"),
      col("line.concept").as("concept"),
      col("line.amount").as("amount"),
      col("header.account_number").as("account_number"),
      col("header.bank").as("bank"),
      col("header.account_alias").as("account_alias"),
      col("header.currency").as("currency"),
      col("header.timeframe").as("report_type"),
      col("header.extraction_timestamp").as("extraction_date"),
      col("userId").as("user_id"),
      col("companyId").as("company_id"),
      normalizeDate(col("line.date")).as("transaction_date"),
      col("line.remaining").as("reported_remaining"),
      createdAt(normalizeDateString(col("header.report_date"))).as("created_at"),
      map_from_entries(col("line.metadata")).as("metadata"))
  }

  /** The silver dedup keys (company_id, checksum, etl_checksum) computed
    * directly from the flat testdata join — the production shape of the
    * ledger scan S7 (a read of the already-materialized silver table).
    * Value-identical to projecting `toSilver ∘ flattenBronze ∘
    * bronzeFromTpch` (the nested round-trip preserves every field), but
    * costs a projection instead of a collect_list + double explode:
    * deriving a ledger from the batch's own expensive plan would make
    * Spark recompute that plan once per anti-join stage (measured 3×
    * full-pipeline scans in q00's physical plan before this existed).
    */
  def tpchSilverKeys(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    import Transforms._
    val flat = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
    flat.select(
      concat(lit("company-"), pmod(col("o_custkey"), lit(10))).as("company_id"),
      md5(concat_ws("-",
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        date_format(col("l_shipdate"), "yyyyMMdd"),
        centsString(col("l_quantity")), centsString(col("l_extendedprice")),
        col("l_returnflag"), col("l_linestatus"))).as("checksum"),
      etlChecksum(
        date_format(col("l_shipdate"), "yyyy-MM-dd"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"), col("l_partkey")),
        centsString(col("l_extendedprice")),
        centsString(col("l_quantity"))).as("etl_checksum"))
  }

  /** Render a timestamp as one of the four reference date formats, keyed
    * deterministically — produces the multi-format date strings the
    * reference ingests (`transactions.py:57-81`). Used by the bronze
    * fixture builder and its DuckDB oracle (same CASE in SQL).
    */
  def mixedDateString(ts: Column, key: Column): Column = {
    val k = pmod(key, lit(4))
    when(k === 0, date_format(ts, "yyyy-MM-dd"))
      .when(k === 1, date_format(ts, "dd-MM-yyyy"))
      .when(k === 2, date_format(ts, "yyyy/MM/dd"))
      .otherwise(date_format(ts, "dd/MM/yyyy"))
  }

  /** Build a bronze-shaped nested frame (FIXTURES.md §1) from the flat
    * testdata: one bronze row per order, one payload element carrying the
    * order's lineitems as `lines`, metadata as ARRAY<STRUCT<key,value>>.
    * This is the inverse of `flattenBronze` ∘ projection, so
    * flatten(build(x)) is value-preserving — which is exactly what the
    * DuckDB oracle checks.
    */
  def bronzeFromTpch(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.alias("l")
    val ord = orders.alias("o")
    val joined = li.join(ord, col("l.l_orderkey") === col("o.o_orderkey"))

    // checksum hashes every line-identifying field: (l_orderkey,
    // l_linenumber) is NOT unique in the testdata, and a checksum that
    // functionally determines the whole silver row makes
    // dropDuplicates(checksum) value-deterministic (any surviving row is
    // identical) and oracle-expressible as SELECT DISTINCT.
    val line = struct(
      md5(concat_ws("-",
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        date_format(col("l_shipdate"), "yyyyMMdd"),
        Transforms.centsString(col("l_quantity")),
        Transforms.centsString(col("l_extendedprice")),
        col("l_returnflag"), col("l_linestatus"))).as("checksum"),
      mixedDateString(col("l_shipdate"), col("l_orderkey") + col("l_linenumber")).as("date"),
      concat_ws(" ", col("l_returnflag"), col("l_linestatus"), col("l_partkey")).as("concept"),
      col("l_extendedprice").as("amount"),
      col("l_quantity").as("remaining"),
      array(
        struct(lit("flag").as("key"), col("l_returnflag").as("value")),
        struct(lit("status").as("key"), col("l_linestatus").as("value"))).as("metadata"))

    joined
      .groupBy(col("l_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(collect_list(line).as("lines"))
      .select(
        col("o_custkey").cast("string").as("userId"),
        concat(lit("company-"), pmod(col("o_custkey"), lit(10))).as("companyId"),
        array(struct(
          struct(
            col("o_custkey").cast("string").as("account_number"),
            concat(lit("acct-"), col("o_custkey")).as("account_alias"),
            lit("EUR").as("currency"),
            col("o_orderpriority").as("timeframe"),
            mixedDateString(col("o_orderdate"), col("l_orderkey")).as("report_date"),
            concat(lit("bank-"), pmod(col("o_custkey"), lit(5))).as("bank"),
            col("o_orderdate").as("extraction_timestamp")).as("header"),
          col("lines").as("lines"))).as("payload"))
  }
}
