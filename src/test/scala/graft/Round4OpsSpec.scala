package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, TextOps}

/** Specs for the round-4 operators: deletion-neighborhood fuzzy join,
  * integer PageRank, and the Bloom-prefiltered ledger anti-join.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------------------
  // editDistanceOnePairs
  // --------------------------------------------------------------------

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistanceOnePairs equals brute force over substitutions, inserts, deletes") {
    val words = Seq("cat", "cut", "cart", "at", "dog", "dig", "dogs", "cat",
      "", "a", "b", "ab", "xyz")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
    val expected = (for {
      (a, i) <- words.zipWithIndex
      (b, j) <- words.zipWithIndex
      if i < j && lev(a, b) <= 1
    } yield (i.toLong, j.toLong, lev(a, b).toLong)).toSet
    val got = TextOps.editDistanceOnePairs(df, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("editDistanceOnePairs emits each pair once (no multi-key duplicates)") {
    val df = Seq((1L, "aaaa"), (2L, "aaaa"), (3L, "aaab")).toDF("id", "s")
    val got = TextOps.editDistanceOnePairs(df, "id", "s")
      .as[(Long, Long, Long)].collect().toList
    assert(got.size == got.distinct.size)
    assert(got.toSet == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  // --------------------------------------------------------------------
  // pageRank
  // --------------------------------------------------------------------

  test("pageRank: symmetric star concentrates rank on the hub") {
    // star: 0 — {1,2,3,4}
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val r = Analytics.pageRank(edges, "src", "dst", iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // hub strictly dominates every leaf; leaves identical by symmetry
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size == 1)
    assert(r(0L) > r(1L))
  }

  test("pageRank: regular graph stays uniform and exactly reproducible") {
    // 4-cycle: every node deg 2 → ranks stay equal each round
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val r = Analytics.pageRank(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r.values.toSet.size == 1)
    // closed form for the uniform fixpoint with integer DIV at scale 1e9:
    // r' = 15e8/10 + 85*r/100 ... converges to ~999999997 with truncation
    val r2 = Analytics.pageRank(edges, "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r == r2)
  }

  test("pageRank drops self-loops and handles duplicate edges") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val r = Analytics.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == r(2L)) // symmetric pair
  }

  // --------------------------------------------------------------------
  // bloomPrefilteredAntiJoin
  // --------------------------------------------------------------------

  test("bloom-prefiltered anti-join equals the plain anti-join (long keys)") {
    val batch = (1L to 500L).map(i => (i, s"row$i")).toDF("k", "payload")
    val ledger = (1L to 500L by 3).map(i => (i, "x")).toDF("k", "junk")
    val expected = batch.join(ledger.select("k").distinct(), Seq("k"), "left_anti")
      .as[(Long, String)].collect().toSet
    // tiny filter + high fpp → false positives guaranteed, result must not change
    val got = Dedup.bloomPrefilteredAntiJoin(batch, ledger, "k",
      expectedItems = 50, fpp = 0.5).as[(Long, String)].collect().toSet
    assert(got == expected)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val v1 = Seq((1L, "a", Some(1.0)), (2L, "b", None), (3L, "c", Some(3.0)),
      (4L, "d", Some(4.0))).toDF("k", "s", "x")
    val v2 = Seq((1L, "a", Some(1.0)), (2L, "b", None), (3L, "CHANGED", Some(3.0)),
      (5L, "e", Some(5.0))).toDF("k", "s", "x")
    val got = Analytics.snapshotDiff(v1, v2, Seq("k"), Seq("s", "x"))
      .select("k", "diff_status").as[(Long, String)].collect().toMap
    // key 2 has NULL x on both sides → unchanged (null-safe <=>), not changed
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("bloom-prefiltered anti-join on string keys, null-safe") {
    val batch = Seq(("a", 1), ("b", 2), (null, 3), ("d", 4))
      .toDF("k", "v")
    val ledger = Seq(("a", 0), ("x", 0)).toDF("k", "v")
    val got = Dedup.bloomPrefilteredAntiJoin(batch, ledger, "k",
      expectedItems = 10).as[(String, Int)].collect().toSet
    // anti-join semantics: null key never matches → survives
    assert(got == Set(("b", 2), (null, 3), ("d", 4)))
  }
}
