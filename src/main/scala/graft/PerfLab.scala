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
      case "silverparts" =>
        import graft.sources.Ingest
        import graft.operators.Transforms
        import org.apache.spark.sql.functions._
        val flat = Ingest.flattenBronze(Ingest.bronzeFromTpch(
          Ingest.table(spark, sfDir, "lineitem"), Ingest.table(spark, sfDir, "orders")))
        time("flat_only", reps)(flat)
        time("silver_nodates", reps)(flat.select(
          col("line.checksum").as("checksum"),
          Transforms.etlChecksum(col("line.date"), col("line.concept"),
            Transforms.centsString(col("line.amount")),
            Transforms.centsString(col("line.remaining"))).as("etl_checksum"),
          col("line.amount").as("amount"),
          col("header.account_number").as("account_number"),
          col("companyId").as("company_id"),
          map_from_entries(col("line.metadata")).as("metadata")))
        time("silver_full", reps)(Ingest.toSilver(flat))
      case "q24probe" =>
        import graft.operators.TextOps
        import graft.sources.Ingest
        import org.apache.spark.sql.functions._
        val docs = Ingest.table(spark, sfDir, "documents")
        val base = docs.select(col("doc_id"),
          TextOps.wordBigrams(TextOps.tokens(col("text"))).as("sh")).filter(size(col("sh")) > 0)
        val sig = base.withColumn("hv", TextOps.shingleHashes(col("sh")))
          .withColumn("sig", TextOps.minhashSignature(col("hv"), 8))
        val banded = sig.select(col("doc_id"),
          posexplode(TextOps.lshBandKeys(col("sig"), 4, 2)).as(Seq("band", "bkey")))
        val cand = banded.alias("x").join(banded.alias("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2")).distinct()
        println("docs=" + docs.count() + " cand=" + cand.count())
        val ex = base.select(col("doc_id"), explode(col("sh")).as("s"))
        println("ex_rows=" + ex.count())
        val inter = cand.join(ex.select(col("doc_id").as("id1"), col("s")), "id1")
          .join(ex.select(col("doc_id").as("id2"), col("s")), Seq("id2", "s"))
        println("inter_rows=" + inter.count())
      case "prphases" =>
        import graft.operators.Analytics
        import graft.sources.Ingest
        import org.apache.spark.sql.functions._
        val edges = Ingest.table(spark, sfDir, "lineitem")
          .select(col("l_partkey").as("src"), (col("l_suppkey") + lit(1L << 40)).as("dst"))
        Seq(0, 1, 3, 10).foreach { it =>
          val t0 = System.nanoTime()
          Analytics.pageRank(edges, "src", "dst", iters = it)
            .write.format("noop").mode("overwrite").save()
          println(f"[perf] pr_iters$it ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case n =>
        Queries.all.find(_.name == n).foreach(q => time(n, reps)(q.fn(spark, sfDir)))
    }
    spark.stop()
  }
}
