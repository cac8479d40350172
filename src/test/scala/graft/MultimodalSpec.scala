package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, VectorOps}
import graft.sources.Ingest

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Ingest.table(spark, "/root/testdata/sf0.001", "documents")
    .limit(50)
    .select(col("doc_id"), col("text").cast("binary").as("bin"))
    .cache()

  test("decode emits typed metadata per blob") {
    val out = Multimodal.decodeMedia(media, "doc_id", "bin")
    assert(out.count() == 50)
    val r = out.filter(col("doc_id") === 0).head()
    assert(r.byte_len > 0 && r.width == r.byte_len % 640)
    assert(r.head_hex.length == 16)
  }

  test("resize keeps ids and bounds output size") {
    val out = Multimodal.resize(media, "doc_id", "bin", 4, 4).collect()
    assert(out.length == 50)
    assert(out.forall(r => r.bytes.length <= r.out_w * r.out_h * 32)) // strided sample bound
    assert(out.forall(r => r.bytes.nonEmpty))
  }

  test("frame sampling emits one row per Nth byte with in-range offsets") {
    val out = Multimodal.sampleFrames(media, "doc_id", "bin", 32)
    val byDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"), max("offset").as("mx"))
      .join(Multimodal.decodeMedia(media, "doc_id", "bin").toDF()
        .select(col("doc_id"), col("byte_len")), "doc_id")
    assert(byDoc.filter(col("mx") >= col("byte_len")).count() == 0)
    assert(byDoc.filter(col("n") =!= ceil(col("byte_len") / 32.0)).count() == 0)
  }

  test("multimodal features feed ANN end-to-end") {
    val feats = Multimodal.extractFeatures(media, "doc_id", "bin")
    val topk = VectorOps.bruteForceTopK(
      feats.filter(col("doc_id") < 2), feats, "doc_id", "embedding", 3)
    val perQuery = topk.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ == 3))
    // histogram vectors are all-positive → cosine in (0, 1]
    assert(topk.filter(col("cosine_sim") <= 0 || col("cosine_sim") > 1.0001).count() == 0)
  }
}
