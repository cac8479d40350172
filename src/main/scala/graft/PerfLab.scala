package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch timing harness for query-shape experiments:
  * `runMain graft.PerfLab <sfDir> <name> [reps]` times registered queries
  * (and ad-hoc variants below) through the same noop sink as Bench.
  */
object PerfLab {
  def time(label: String, reps: Int)(f: => DataFrame): Unit = {
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[perf] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq.empty
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-perflab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach {
      case "stages" =>
        import graft.sources.Ingest
        import graft.operators.{Dedup, Transforms}
        import org.apache.spark.sql.functions._
        val li = Ingest.table(spark, sfDir, "lineitem")
        val ord = Ingest.table(spark, sfDir, "orders")
        time("a_bronze", reps)(Ingest.bronzeFromTpch(li, ord))
        time("b_flatten", reps)(Ingest.flattenBronze(Ingest.bronzeFromTpch(li, ord)))
        time("c_silver", reps)(Ingest.toSilver(Ingest.flattenBronze(Ingest.bronzeFromTpch(li, ord))))
        time("d_dedup", reps)(Dedup.exact(
          Ingest.toSilver(Ingest.flattenBronze(Ingest.bronzeFromTpch(li, ord))), Seq("checksum")))
        time("e_ledger", reps)(Ingest.tpchSilverKeys(li, ord)
          .filter(substring(col("checksum"), 1, 1) === "0"))
      case n =>
        Queries.all.find(_.name == n).foreach(q => time(n, reps)(q.fn(spark, sfDir)))
    }
    spark.stop()
  }
}
