package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Format pluggability (S3's capability class): the engine's sources and
  * sinks are `spark.read`/`write` format strings, so ORC / JSON / CSV
  * round-trip the same frames parquet does. The reference's actual
  * format is Avro (`/root/reference/etl/extraction/avro.py`); the
  * spark-avro connector jar is not in this container, so ORC stands in
  * as the second columnar binary format — the swap is the format string
  * only.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
  private lazy val li = Ingest.table(spark, "/root/testdata/sf0.001", "lineitem")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")

  private def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, String)] =
    df.select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("l_quantity").cast("double"), col("l_returnflag"))
      .as[(Long, Long, Double, String)].collect().toSet

  test("ORC round-trips the lineitem projection bit-exactly") {
    li.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.schema("l_shipdate").dataType == li.schema("l_shipdate").dataType)
    assert(key(back) == key(li))
  }

  test("JSON lines round-trip with an explicit read schema") {
    li.write.mode("overwrite").json(s"$dir/json")
    val back = spark.read.schema(li.schema).json(s"$dir/json")
    assert(key(back) == key(li))
  }

  test("CSV round-trips with header + explicit schema (dates preserved)") {
    li.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = spark.read.schema(li.schema).option("header", "true").csv(s"$dir/csv")
    assert(key(back) == key(li))
    val d = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(max(col("l_shipdate")).cast("string")).head().getString(0)
    assert(d(back) == d(li))
  }

  test("partitioned ORC write prunes partitions at read (layout parity with parquet silver)") {
    val part = li.withColumn("bucket", pmod(col("l_orderkey"), lit(4)))
    part.write.mode("overwrite").partitionBy("bucket").orc(s"$dir/orc_part")
    val pruned = spark.read.orc(s"$dir/orc_part").filter(col("bucket") === 1)
    val plan = pruned.queryExecution.executedPlan.toString()
    // partition filter must land in the scan's partition filters, not a
    // post-scan Filter over all partitions
    assert(pruned.count() == part.filter(col("bucket") === 1).count())
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"))
  }
}
