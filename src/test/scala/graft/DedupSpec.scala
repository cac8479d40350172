package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val batch = Seq(
    ("co1", "ck1", "e1"), ("co1", "ck2", "e2"), ("co1", "ck3", "e3"),
    ("co2", "ck1", "e1"), // same checksum, different company → must survive
    ("co2", "ck9", "e9")
  ).toDF("company_id", "checksum", "etl_checksum")

  test("F1 two-stage anti-join is company-scoped") {
    val ledger = Seq(("co1", "ck1", "zz"), ("co1", "zz", "e2")).toDF(
      "company_id", "checksum", "etl_checksum")
    val out = Dedup.againstLedger(batch, ledger)
      .select("company_id", "checksum").as[(String, String)].collect().toSet
    // co1/ck1 dropped by stage 1; co1/ck2 dropped by stage 2 (etl match);
    // co2 rows untouched despite sharing checksum values with co1's ledger.
    assert(out == Set(("co1", "ck3"), ("co2", "ck1"), ("co2", "ck9")))
  }

  test("F1 empty batch and empty ledger are correct by construction (Q5)") {
    val empty = batch.limit(0)
    assert(Dedup.againstLedger(empty, batch).count() == 0)
    assert(Dedup.againstLedger(batch, empty).count() == batch.count())
  }

  test("F3 first-writer-wins keeps exactly the first row per key") {
    val df = Seq(("k1", 2, "second"), ("k1", 1, "first"), ("k2", 5, "only"))
      .toDF("checksum", "seq", "payload")
    val out = Dedup.firstWriterWins(df, Seq("checksum"), Seq(col("seq")))
      .select("checksum", "payload").as[(String, String)].collect().toSet
    assert(out == Set(("k1", "first"), ("k2", "only")))
  }

  test("F2 isin exclusion, empty list is identity") {
    assert(Dedup.excludeIds(batch, "checksum", Seq("ck1")).count() == 3)
    assert(Dedup.excludeIds(batch, "checksum", Nil).count() == 5)
  }

  test("mergeUpsert: updates win on match, unmatched target survives, empty edges") {
    val target = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val updates = Seq((2L, "new2"), (4L, "new4")).toDF("k", "v")
    val out = Dedup.mergeUpsert(target, updates, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "old1"), (2L, "new2"), (3L, "old3"), (4L, "new4")))
    // empty updates → target unchanged; empty target → updates
    assert(Dedup.mergeUpsert(target, updates.limit(0), Seq("k"))
      .as[(Long, String)].collect().toSet == Set((1L, "old1"), (2L, "old2"), (3L, "old3")))
    assert(Dedup.mergeUpsert(target.limit(0), updates, Seq("k"))
      .as[(Long, String)].collect().toSet == Set((2L, "new2"), (4L, "new4")))
  }

  test("keepBestPerCluster: argmax score wins, ties to lowest id, singletons kept") {
    val df = Seq(
      (1L, 10L, 5L),  // cluster 10: doc 2 scores higher
      (2L, 10L, 9L),
      (3L, 30L, 7L),  // cluster 30: tie on score → doc 3 (lower id) wins
      (4L, 30L, 7L),
      (5L, 50L, -2L)  // singleton: kept even with a negative score
    ).toDF("doc_id", "cluster_id", "logit_micro")
    val kept = Dedup.keepBestPerCluster(df, "cluster_id", "logit_micro", "doc_id")
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 5L))
    // exactly one keeper per cluster, every input row passes through
    val out = Dedup.keepBestPerCluster(df, "cluster_id", "logit_micro", "doc_id")
    assert(out.count() == 5)
    assert(out.filter(col("keep")).groupBy("cluster_id").count()
      .filter(col("count") =!= 1).count() == 0)
  }
}
