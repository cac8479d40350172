package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): image/audio/video as
  * opaque BINARY columns with typed metadata, decoded per-partition.
  *
  * The container has no image/audio libraries, so the decode itself is a
  * clearly-marked DETERMINISTIC FAKE (arithmetic over byte length + head
  * bytes); the Spark-side plumbing — binary column, typed Dataset,
  * `mapPartitions` batch shape, schema of the decoded output — is real
  * and oracle-checked.
  */
object Multimodal {

  /** Decoded-media metadata record (the schema a real decoder would emit). */
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long,
      n_frames: Long, head_hex: String)

  /** STUB decode — a real implementation would call an image/audio codec
    * here (per-partition, so codec init amortizes across a batch, the same
    * shape `mapInPandas` gives PySpark). Deterministic fake:
    * width/height/frames derived from byte length, feature = first 8
    * bytes hex.
    */
  def decodeMedia(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site (codec handle, model weights, ...)
        it.map { case (id, bytes) =>
          val len = bytes.length.toLong
          MediaMeta(
            doc_id = id,
            byte_len = len,
            width = len % 640,
            height = (len * 7) % 480,
            n_frames = len % 30,
            head_hex = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString)
        }
      }
  }

  /** Resized-media record: real schema, stubbed resample. */
  case class ResizedMedia(doc_id: Long, out_w: Int, out_h: Int, bytes: Array[Byte])

  /** STUB resize — a real codec would resample pixels; the fake keeps a
    * deterministic strided sample of the payload so output size tracks
    * the requested dims. Partitioning/batching shape is the real thing.
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val target = math.max(1, math.min(outW * outH, bytes.length))
          val stride = math.max(1, bytes.length / target)
          ResizedMedia(id, outW, outH, bytes.grouped(stride).map(_.head).toArray)
        }
      }
  }

  /** One sampled frame: offset into the payload + a scalar feature. */
  case class FrameSample(doc_id: Long, frame_idx: Int, offset: Long, feature: Double)

  /** STUB frame sampling — every `everyN` bytes stands in for every Nth
    * video frame; emits one row per frame (the explode shape a real
    * frame sampler produces).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      everyN: Int): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, bytes.length, everyN).zipWithIndex.map { case (off, idx) =>
          FrameSample(id, idx, off.toLong, (bytes(off) & 0xff) / 255.0)
        }
      }
  }

  /** STUB feature extraction — an 8-bucket byte histogram as the
    * "embedding" (a real extractor would run a vision/audio model per
    * partition). Output plugs directly into VectorOps ANN: the
    * multimodal → embedding → similarity-search pipeline end to end.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val hist = new Array[Float](8)
        bytes.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = math.max(1, bytes.length).toFloat
        (id, hist.map(_ / n).toSeq)
      }
      .toDF(idCol, "embedding")
  }
}
