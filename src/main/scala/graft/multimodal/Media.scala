package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, processed in batched partition passes.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, feature
  * vectors as Array[Float]) is real and tested; the decode kernels are STUBS —
  * this container has no image/audio codecs, so `decodeImageStub` derives a
  * deterministic fake feature vector from the bytes. A production build swaps
  * the stub body for a real codec call; nothing else changes.
  */
object Media {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int, format: String)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Float])

  /** Synthetic media table: deterministic fake payloads derived from doc ids
    * (kind/dimensions in closed form; bytes from a seeded per-id generator).
    */
  def media(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")).as[Long].map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (id % 8).toInt * 16
      val h = 16 + (id % 5).toInt * 16
      // deterministic pseudo-payload (stands in for encoded pixels/samples)
      val n = 256 + (id % 7).toInt * 128
      val bytes = new Array[Byte](n)
      var s = id * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bytes(i) = (s >>> 56).toByte
        i += 1
      }
      MediaRow(id, kind, bytes, w, h, if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4")
    }
  }

  /** STUB image decode → feature vector. Real implementation would decode the
    * codec and pool pixel statistics; the stub derives `dim` deterministic
    * floats from the byte content so the distributed plumbing (batching,
    * schema, downstream ANN) is exercised end-to-end.
    */
  def decodeImageStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      out(i % dim) += ((acc >>> 32).toInt / Int.MaxValue.toFloat)
      i += 1
    }
    out
  }

  /** STUB resize: returns metadata-adjusted row (no pixel work in-sandbox). */
  def resizeStub(row: MediaRow, w: Int, h: Int): MediaRow = row.copy(width = w, height = h)

  /** STUB frame sampler: every k-th "frame" boundary as byte offsets. */
  def sampleFrameOffsetsStub(bytes: Array[Byte], everyK: Int): Array[Int] =
    (0 until bytes.length by math.max(1, everyK)).toArray

  /** Batched feature extraction — one partition pass, codec state (here: none;
    * in production: the decoder) initialized once per partition, matching the
    * mapInPandas batch shape the reference-scale pipeline would use.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init point for a real codec would be here
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, decodeImageStub(m.bytes, dim))
      }
    }
  }

  /** Features table as a DataFrame (schema: media_id, kind, n_bytes, features). */
  def featureTable(spark: SparkSession, sfDir: String, dim: Int = 16): DataFrame =
    extractFeatures(media(spark, sfDir), dim).toDF()
}
