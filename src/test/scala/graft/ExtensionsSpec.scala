package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions-injected function path must behave exactly like the
  * runtime-registered one.
  *
  * Session handling: extensions bind at session BUILD, and `getOrCreate`
  * returns the existing default session (without them) when one is
  * active — so the default/active sessions are cleared first, forcing a
  * fresh session over the (possibly shared) SparkContext. The injector
  * is applied via `builder.withExtensions`: the equivalent
  * `spark.sql.extensions=graft.functions.GraftExtensions` string conf is
  * STATIC — honored only when the SparkContext itself is being created,
  * which a shared-JVM suite can't rely on. The new session is NOT
  * stopped — that would stop the shared context for every later suite —
  * only de-registered by restoring the previous default.
  */
class ExtensionsSpec extends AnyFunSuite {
  test("withExtensions(GraftExtensions) injects graft functions at session build") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new graft.functions.GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val dot = s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val n = s.sql(
        "SELECT graft_sorted_intersect_size(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
        .head().getInt(0)
      assert(n == 2)

      // optimizer rule, pattern 1: size(array_intersect(sort_array(
      // array_distinct(..)), ..)) over null-free ARRAY<BIGINT> keeps the
      // visible sorts and fuses the native two-pointer merge.
      // range()-derived arrays: a literal LocalRelation would be constant-
      // folded before the plan assertion could observe the rewrite.
      import org.apache.spark.sql.functions.{array, array_distinct, array_intersect, col, lit, size, sort_array}
      import s.implicits._
      def sd(c: org.apache.spark.sql.Column) = sort_array(array_distinct(c))
      val df = s.range(1, 3).select(
          array(col("id"), col("id") + 1, lit(9L)).as("a"),
          array(col("id") + 1, lit(9L)).as("b"))
        .select(size(array_intersect(sd(col("a")), sd(col("b")))).as("n"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_sorted_intersect_size"))
      assert(df.as[Int].collect().toSeq == Seq(2, 2))
      // pattern 2 (round 7): the BARE built-in fuses to the hash-count —
      // full array_intersect semantics, no per-row sort insertion (the
      // round-2 sort-inserting form was a measured pessimization)
      val bare = s.range(1, 3).select(
          array(col("id"), lit(9L)).as("a"), array(lit(9L)).as("b"))
        .select(size(array_intersect(col("a"), col("b"))).as("n"))
      val barePlan = bare.queryExecution.optimizedPlan.toString
      assert(barePlan.contains("graft_intersect_size")
        && !barePlan.contains("graft_sorted_intersect_size"))
      assert(bare.as[Int].collect().toSeq == Seq(1, 1))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
