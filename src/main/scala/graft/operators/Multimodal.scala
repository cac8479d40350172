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
}
