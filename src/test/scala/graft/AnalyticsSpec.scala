package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.sources.Ingest

class AnalyticsSpec extends SparkSpec {

  test("connectedComponents: chains, separate components, partitioning-invariant") {
    import spark.implicits._
    import graft.operators.Analytics
    // component {1,2,3,4} as a chain (diameter 3), component {10,11},
    // self-loop singleton {20}
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (10L, 11L), (20L, 20L))
      .toDF("s", "d")
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.connectedComponents(df, "s", "d")
        .as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L)
    assert(run(edges) == expected)
    assert(run(edges.repartition(7)) == expected)
  }

  import spark.implicits._

  test("salted sum equals direct aggregation (skew path is value-neutral)") {
    // pathological skew: one key holds 90% of rows
    val rows = Seq.tabulate(10000)(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong, i * 0.01))
    val df = rows.toDF("key", "payload", "v").repartition(8)
    val salted = Analytics.saltedSum(df, Seq("key"), col("v"), "total",
        saltFrom = col("payload"), saltBuckets = 16)
      .select("key", "total", "total_n")
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val direct = df.groupBy(col("key"))
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("t"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted == direct) // exact decimal partials → bitwise equal
  }

  test("sessionize splits on the gap, exact microsecond arithmetic") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq(
      (1L, ts(0), 100L), (1L, ts(10), 101L), (1L, ts(55), 102L), // gap 45min → 2 sessions
      (2L, ts(5), 200L)
    ).toDF("user_id", "ts", "event_id")
    val out = Analytics.sessionize(df, "user_id", "ts", "event_id", 30L * 60 * 1000 * 1000)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 100L, 1L), (1L, 101L, 1L), (1L, 102L, 2L), (2L, 200L, 1L)))
  }

  test("intervalOverlapJoin: exact pairs, one emit each, cross-bin overlaps found") {
    // bin width 10: intervals spanning bins + pairs overlapping across bins
    val iv = Seq(
      (1L, 0L, 12L),   // spans bins 0-1
      (2L, 11L, 15L),  // bin 1; overlaps 1 in bin 1
      (3L, 14L, 30L),  // bins 1-3; overlaps 2 in bin 1
      (4L, 40L, 45L),  // bin 4; overlaps nothing
      (5L, 29L, 31L)   // bins 2-3; overlaps 3
    ).toDF("id", "s", "e")
    val out = Analytics.intervalOverlapJoin(iv, iv, "id", "s", "e", "id", "s", "e", 10L)
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "overlap_micros")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L), (2L, 3L, 1L), (3L, 5L, 1L)))
  }

  test("intervalOverlapJoin: each pair exactly once even over many shared bins") {
    val iv = Seq((1L, 0L, 100L), (2L, 5L, 95L)).toDF("id", "s", "e")
    val rows = Analytics.intervalOverlapJoin(iv, iv, "id", "s", "e", "id", "s", "e", 10L)
      .filter(col("id1") < col("id2")).collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 90L)
  }

  test("scd2: consecutive-duplicate collapse, version ranges, A-B-A reopens") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val df = Seq(
      (1L, 10L, d("2024-01-01"), "gold"),
      (1L, 11L, d("2024-02-01"), "gold"),   // no change → collapsed
      (1L, 12L, d("2024-03-01"), "silver"), // change
      (1L, 13L, d("2024-04-01"), "gold"),   // A-B-A: reopens a NEW gold version
      (2L, 20L, d("2024-01-15"), "bronze")
    ).toDF("k", "ord_id", "dt", "tier")
    val out = Analytics.scd2(df, "k", "dt", "ord_id", Seq("tier"))
      .select("k", "tier", "valid_from", "valid_to")
      .as[(Long, String, java.sql.Date, Option[java.sql.Date])].collect().toSet
    assert(out == Set(
      (1L, "gold", d("2024-01-01"), Some(d("2024-03-01"))),
      (1L, "silver", d("2024-03-01"), Some(d("2024-04-01"))),
      (1L, "gold", d("2024-04-01"), None),
      (2L, "bronze", d("2024-01-15"), None)))
  }

  test("gapFillDaily: calendar holes filled forward, flags set, no fill before first") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val df = Seq(
      (1L, d("2024-01-01"), 10.0), (1L, d("2024-01-04"), 40.0),
      (2L, d("2024-02-01"), 5.0)
    ).toDF("k", "day", "v")
    val out = Analytics.gapFillDaily(df, "k", "day", "v")
      .select("k", "day", "v", "was_gap")
      .as[(Long, java.sql.Date, Double, Boolean)].collect().toSet
    assert(out == Set(
      (1L, d("2024-01-01"), 10.0, false),
      (1L, d("2024-01-02"), 10.0, true),
      (1L, d("2024-01-03"), 10.0, true),
      (1L, d("2024-01-04"), 40.0, false),
      (2L, d("2024-02-01"), 5.0, false)))
  }

  test("runningSum is exact and per-partition monotone") {
    val li = Ingest.table(spark, "/root/testdata/sf0.001", "lineitem").limit(1000)
    val out = Analytics.runningSum(li, Seq("l_suppkey"),
      Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
      col("l_quantity"), "run")
    val perKey = out.groupBy("l_suppkey")
      .agg(max("run").as("mx"), sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("tot"))
    assert(perKey.filter(col("mx") =!= col("tot")).count() == 0)
  }

  test("incrementalComponents: update == full recompute; merges take global min") {
    import spark.implicits._
    // yesterday: components {1,2,3} (label 1), {5,6} (label 5), singleton 9
    val oldEdges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val assignment = Analytics.connectedComponents(oldEdges, "a", "b")
      .withColumnRenamed("id", "node")
      .unionByName(Seq((9L, 9L)).toDF("node", "component")) // old singleton
    // today: edge 3-5 MERGES the two components; 10-11 is a brand-new
    // pair; 9 stays untouched
    val newEdges = Seq((3L, 5L), (10L, 11L)).toDF("a", "b")
    val inc = Analytics.incrementalComponents(assignment, "node",
        "component", newEdges, "a", "b")
      .as[(Long, Long)].collect().toMap
    // full recompute over ALL edges for comparison
    val full = Analytics.connectedComponents(
        oldEdges.unionByName(newEdges), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(inc.filterKeys(_ != 9L).toMap == full,
      s"incremental $inc != recompute $full") // 9 has no edges in full
    // merged component takes the GLOBAL min id
    assert(Seq(1L, 2L, 3L, 5L, 6L).forall(inc(_) == 1L))
    assert(inc(10L) == 10L && inc(11L) == 10L)
    assert(inc(9L) == 9L) // untouched singleton survives via its star edge
  }

  test("skewReport: hand-computed shares, entropy and top-k order") {
    import spark.implicits._
    // key 1 × 6, key 2 × 2, keys 3/4 × 1 → n=10, 4 keys
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L)).toDF("k")
    val out = Analytics.skewReport(rows, "k", k = 3)
      .select("key", "cnt", "share_micro", "n_rows", "n_keys", "entropy_micro")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    def term(c: Long): Long =
      math.round(math.log(10.0 / c) * (c / 10.0) * 1e6)
    val entropy = term(6) + term(2) + term(1) + term(1)
    // keys report as strings: the 100 TB skew culprit is usually a domain
    assert(out == Seq(
      ("1", 6L, 600000L, 10L, 4L, entropy),
      ("2", 2L, 200000L, 10L, 4L, entropy),
      ("3", 1L, 100000L, 10L, 4L, entropy)))
  }
}
