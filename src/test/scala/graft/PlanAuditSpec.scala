package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: the scale claims the operator docs make, asserted
  * against the actual Catalyst output so regressions surface as test
  * failures rather than 100-TB incidents.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    // crossJoin against a broadcast side plans BroadcastNestedLoopJoin
    // (bounded: |small| × partition) — an unhinted CartesianProduct is the
    // O(n²) shuffle explosion no registered query should ever produce.
    Queries.all.foreach { q =>
      val plan = q.fn(spark, sfDir).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n$plan")
    }
  }

  test("star join broadcasts every dimension (q84)") {
    val plan = Queries.all.find(_.name == "q84_star_revenue").get
      .fn(spark, sfDir).queryExecution.sparkPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$plan")
  }

  test("column pruning reaches the parquet scan through the ingest fan-out") {
    import graft.sources.Ingest
    val df = Ingest.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads pruned columns: $readSchema")
  }

  test("partition-column filters are pushed to the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .select(col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]")
      || scan.contains("EqualTo(l_returnflag,R)"),
      s"filter not pushed to scan:\n$scan")
  }
}
