package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Property test for the binned interval overlap join: on deterministic
  * random interval sets, the binned plan must emit EXACTLY the pairs the
  * brute-force theta join finds — each exactly once (the
  * claim-by-overlap-start-bin dedup), with exact overlap lengths — across
  * bin widths smaller than, comparable to, and larger than the interval
  * lengths. One Spark pass per width (per-sample jobs would crawl).
  */
class OverlapPropSpec extends SparkSpec {
  import spark.implicits._

  test("binned overlap join ≡ brute-force theta join for every bin width") {
    val rnd = new scala.util.Random(7)
    // 300 intervals over a span straddling zero (pre-epoch times must bin
    // by FLOOR division, not truncation), lengths 0–400 (incl. points)
    val iv = (1L to 300L).map { id =>
      val s = (rnd.nextInt(10000) - 5000).toLong
      (id, s, s + rnd.nextInt(401).toLong)
    }
    val df = iv.toDF("id", "s", "e")

    val brute = df.as("a").join(df.as("b"),
        col("a.id") < col("b.id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (least(col("a.e"), col("b.e")) - greatest(col("a.s"), col("b.s")))
          .as("ov"))
      .as[(Long, Long, Long)].collect().toSeq

    for (width <- Seq(7L, 100L, 1000L, 100000L)) {
      val binned = Analytics.intervalOverlapJoin(
          df, df, "id", "s", "e", "id", "s", "e", width)
        .filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"), col("overlap_micros"))
        .as[(Long, Long, Long)].collect().toSeq
      // multiset equality: same pairs, same overlaps, no duplicate emits
      assert(binned.sorted == brute.sorted, s"bin width $width diverged")
    }
  }
}
