package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, TextOps}

/** Property tests for the round-4 operators: the blocked fuzzy join must
  * equal brute force on random strings, and distributed integer PageRank
  * must equal a sequential reference implementation on random graphs.
  */
class Round4PropSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistanceOnePairs equals brute force on random small-alphabet strings") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // small alphabet + short lengths maximize near-collisions
      val words = Seq.fill(60)(
        (0 until rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
      val expected = (for {
        (a, i) <- words.zipWithIndex; (b, j) <- words.zipWithIndex
        if i < j && lev(a, b) <= 1
      } yield (i.toLong, j.toLong, lev(a, b).toLong)).toSet
      val got = TextOps.editDistanceOnePairs(df, "id", "s")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"trial $trial: blocked != brute force")
    }
  }

  /** Sequential reference: exactly the operator's integer recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val base = 15L * scale / 100L
    var r = adj.keys.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      r = adj.keys.map { v =>
        // incoming = symmetric neighbors of v
        val s = adj(v).map(u => r(u) / deg(u)).sum
        v -> (base + (85L * s) / 100L)
      }.toMap
    }
    r
  }

  test("pageRank equals the sequential integer reference on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(80)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val got = Analytics.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 6)
        .as[(Long, Long)].collect().toMap
      val want = refPageRank(edges, iters = 6, scale = 1000000000L)
      assert(got == want, s"trial $trial: distributed != sequential reference")
    }
  }
}
