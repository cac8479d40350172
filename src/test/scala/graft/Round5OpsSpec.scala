package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, TextOps, VectorOps}

/** Round-5 operators: SimHash Hamming banding, Pareto frontier,
  * triangle counting, mutual k-NN. Each is checked against a brute-force
  * definitional computation on small inputs — the same
  * blocked-equals-brute-force discipline as editDistanceOnePairs /
  * StarCCPropSpec.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- simhash

  private def bruteHammingPairs(docs: DataFrame, maxDist: Int): Set[(Long, Long, Long)] = {
    val sh = TextOps.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (i1, s1) <- sh; (i2, s2) <- sh if i1 < i2
      d = java.lang.Long.bitCount(s1 ^ s2)
      if d <= maxDist
    } yield (i1, i2, d.toLong)).toSet
  }

  test("simhashHammingPairs equals brute-force Hamming join (pigeonhole exactness)") {
    // near-identical doc families (tiny Hamming gaps) + unrelated docs
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "pack my box with five dozen liquor jugs"),
      (5L, "pack my box with five dozen liquor mugs"),
      (6L, "completely unrelated text about spark plans"),
      (7L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (8L, ""), // tokenless → all-zero-vote fingerprint
      (9L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.simhashHammingPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === bruteHammingPairs(docs, 3))
    // exact dups are at distance 0 and must be present
    assert(got.contains((1L, 7L, 0L)))
    assert(got.contains((8L, 9L, 0L)))
  }

  test("simhashHammingPairs rejects radii beyond the banding guarantee") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.simhashHammingPairs(docs, "doc_id", "text", maxDist = 4)
    }
  }

  // ----------------------------------------------------------------- pareto

  private def bruteFrontier(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet

  test("paretoFrontier equals brute-force dominance filter (random points, ties included)") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = pts.toDF("id", "x", "y").repartition(7) // multiple local sweeps
    val got = Analytics.paretoFrontier(df, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === bruteFrontier(pts))
    assert(got.nonEmpty)
  }

  test("paretoFrontier keeps duplicate points that tie on both dims") {
    val df = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 5L, 5L)).toDF("id", "x", "y")
    val got = Analytics.paretoFrontier(df, "x", "y")
      .select("id").as[Long].collect().toSet
    // neither copy dominates the other (no strict improvement) → both stay
    assert(got === Set(1L, 2L))
  }

  // -------------------------------------------------------------- triangles

  private def triCounts(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val df = edges.toDF("u", "v")
    val Array(r: Row) = Analytics.triangleCount(df, "u", "v").collect()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangleCount on known graphs") {
    // K4: C(4,3) = 4 triangles, 6 edges
    val k4 = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    assert(triCounts(k4) === ((4L, 6L, 4L)))
    // 5-cycle: no triangles
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(triCounts(c5) === ((5L, 5L, 0L)))
    // two triangles sharing edge (1,2)
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(triCounts(bowtie) === ((4L, 5L, 2L)))
  }

  test("triangleCount canonicalizes duplicates, reversed edges and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(triCounts(messy) === ((3L, 3L, 1L)))
  }

  // ------------------------------------------------------------- mutual kNN

  test("mutualTopK pairs are reciprocal members of bucket-local top-k") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() - 0.5).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val k = 3
    val topk = VectorOps.bucketedTopK(df, df, "vec_id", "embedding", k, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = VectorOps.mutualTopK(df, "vec_id", "embedding", k, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = topk.filter { case (a, b) => a < b && topk.contains((b, a)) }
    assert(got === expected)
    assert(got.nonEmpty) // fixture produces at least one reciprocal pair
  }
}
