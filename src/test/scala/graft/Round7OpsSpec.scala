package graft

import graft.operators.VectorOps

/** Round-7 operator units: the fixed-centroid ANN serve path. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("assignCells: exact argmin on |c|^2 - 2 v.c, ties to the lower cell id") {
    // centroids in quantized units; vectors in raw units (quantize x1000)
    val cents: Array[Seq[Double]] =
      Array(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)),   // d = (0, 100, 100)       -> cell 0
      (2L, Seq(0.009f, 0.0f)), // v=(9,0): d=(0,-80,100)  -> cell 1
      (3L, Seq(0.005f, 0.0f)), // v=(5,0): d=(0, 0, 100)  -> tie 0/1 -> 0
      (4L, Seq(0.0f, 0.008f))  // v=(0,8): d=(0,100,-60)  -> cell 2
    ).toDF("vec_id", "embedding")
    val got = VectorOps.assignCells(df, "vec_id", "embedding", cents)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 2))
  }
}
