package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Sink
import graft.sources.Ingest

class SinkSpec extends SparkSpec {

  private lazy val silver = Ingest.toSilver(Ingest.flattenBronze(
    Ingest.bronzeFromTpch(
      Ingest.table(spark, "/root/testdata/sf0.001", "lineitem").limit(500),
      Ingest.table(spark, "/root/testdata/sf0.001", "orders")))).cache()

  test("L1 silver sink: partitioned parquet append, partition pruning on read") {
    val dir = Files.createTempDirectory("graft-silver").toString
    Sink.writeSilver(silver, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == silver.count())
    // hive layout by company → partition filter prunes files
    val one = silver.select("company_id").head().getString(0)
    val pruned = back.filter(col("company_id") === one)
    assert(pruned.count() == silver.filter(col("company_id") === one).count())
    val scanned = pruned.queryExecution.executedPlan.toString()
    assert(scanned.contains("PartitionFilters"))
  }

  test("T7/L2 pubsub projection drops created_at + etl_checksum, keeps the rest") {
    val msgs = Sink.pubsubMessages(silver)
    val m = msgs.head().getString(0)
    assert(m.contains("\"checksum\""))
    assert(m.contains("\"metadata\""))
    assert(!m.contains("created_at"))
    assert(!m.contains("etl_checksum"))
    // JSON lines sink round-trips through a text file
    val dir = Files.createTempDirectory("graft-msgs").toString + "/out"
    Sink.writeJsonLines(silver, dir)
    val back = spark.read.text(dir)
    assert(back.count() == silver.count())
    assert(Sink.logged(silver) == silver.count()) // L4
  }
}
