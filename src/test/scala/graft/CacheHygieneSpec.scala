package graft

/** The [[CacheScope]] gate (round-7 verdict item 2): cache lifecycle is
  * an API, not a scaladoc contract. Every registered query — including
  * the ones whose operators pin multi-branch intermediates
  * (triangleCount, pareto, ewma, stableRowIds, the q24/q36 shingle
  * bases, q00/q108's ledger keys) — must leave
  * `spark.sharedState.cacheManager` EMPTY once its result is
  * materialized: operators release their own pins, so Bench/Verify no
  * longer carry a manual `clearCache()` and a long-lived application
  * can run queries forever without leaking storage memory. (Checkpoint
  * blocks backing scoped results are GC-managed by the ContextCleaner —
  * they are not cache entries and free themselves when the result is
  * dropped.)
  */
class CacheHygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("cacheManager is empty after every registered query materializes") {
    // start clean: another suite sharing the session may have pinned data
    spark.catalog.clearCache()
    val leaks = Queries.all.flatMap { q =>
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      if (spark.sharedState.cacheManager.isEmpty) None
      else {
        spark.catalog.clearCache() // isolate the report per query
        Some(q.name)
      }
    }
    assert(leaks.isEmpty,
      s"queries left cached plans behind (unscoped persist?): $leaks")
  }
}
