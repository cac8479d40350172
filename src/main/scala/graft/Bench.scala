package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Materializes every registered query through the `noop` sink so the
  * full plan executes (a bare `count()` lets Catalyst prune projections
  * and skip most of the work — that would be benchmarking the optimizer's
  * ability to delete the query, not run it).
  *
  * REP PROTOCOL (round 6): each query runs `SPARK_GRAFT_REPS` times
  * (default 3) and the headline `queries` map reports the per-query
  * MEDIAN; the raw per-rep timings ship alongside under `reps`. One rep
  * on a shared box is not a measurement — round 5's driver run showed
  * 8–27× contention artifacts (q60: 65 s driver vs 2.4 s isolated, same
  * build). Medians over ≥3 reps make round-over-round comparison
  * meaningful; see BASELINE.md "How to compare rounds".
  */
object Bench {

  /** Median of the successful (>= 0) rep timings; -1 if every rep failed. */
  private def median(xs: Seq[Double]): Double = {
    val ok = xs.filter(_ >= 0).sorted
    if (ok.isEmpty) -1.0
    else if (ok.size % 2 == 1) ok(ok.size / 2)
    else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // optional comma-separated name filter for isolated perf work, e.g.
    // SPARK_GRAFT_ONLY=q104_triangle_count,q28_ann_ivf_topk
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val suite = only.fold(Queries.all)(names => Queries.all.filter(q => names(q.name)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest SF so per-query numbers measure
    // the plan, not JIT compilation of Spark itself.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // rep-major order (full suite, then repeat) rather than query-major:
    // back-to-back reps of the same query would share still-warm OS page
    // cache and JIT state unrepresentatively, and a transient contention
    // spike on the box would poison all reps of one query instead of one
    // rep of many.
    val timings = Array.fill(reps)(Map.empty[String, Double])
    for (r <- 0 until reps) {
      timings(r) = suite.map { q =>
        val t0 = System.nanoTime()
        val ok =
          try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} rep $r failed: ${e.getMessage}")
            false
          }
        // queries are independent: drop any cache a query built (e.g. a
        // persisted ledger) so storage memory can't squeeze execution
        // memory for the remaining queries and timings stay isolated
        spark.catalog.clearCache()
        // failed queries record the sentinel -1, never a healthy-looking
        // near-zero elapsed time
        q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    }

    val names = suite.map(_.name)
    val medians = names.map(n => n -> median(timings.map(_(n)).toSeq))
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val repArr = names.map { n =>
      "\"" + n + "\":" + timings.map(_(n)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = medians.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = medians.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repArr,"n_reps":$reps,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
