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

  // ------------------------------------------------------ frequent items MG

  test("graft_freq is exact (dec=0) when k covers the whole domain") {
    graft.functions.GraftFunctions.register(spark)
    val items = Seq("a", "a", "a", "b", "b", "c").toDF("it").repartition(3)
    val r = items.agg(expr("graft_freq(it, 10)").as("sk")).select("sk.*")
      .collect().head
    val got = r.getSeq[Row](0).map(x => (x.getString(0), x.getLong(1)))
    // sorted by (cnt desc, item); no decrements ever fired
    assert(got === Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    assert(r.getLong(1) === 0L) // dec
    assert(r.getLong(2) === 6L) // n
  }

  test("graft_freq certificate holds under forced decrements and merges") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(3)
    // zipf-ish: item i appears ~ 600/i times
    val data = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"item$i"))
    val shuffled = rnd.shuffle(data)
    val exact = data.groupBy(identity).map { case (k2, v) => (k2, v.size.toLong) }
    val k = 8
    val r = shuffled.toDF("it").repartition(13)
      .agg(expr(s"graft_freq(it, $k)").as("sk")).select("sk.*")
      .collect().head
    val got = r.getSeq[Row](0).map(x => (x.getString(0), x.getLong(1)))
    val dec = r.getLong(1)
    assert(r.getLong(2) === data.size.toLong)
    assert(dec <= data.size.toLong / (k + 1))
    got.foreach { case (it, cnt) =>
      val c = exact(it)
      assert(cnt <= c && c <= cnt + dec, s"$it: $cnt vs true $c (dec=$dec)")
    }
    exact.filter(_._2 > dec).keys.foreach(it =>
      assert(got.exists(_._1 == it), s"heavy $it missing"))
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
