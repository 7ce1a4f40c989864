package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape (mapPartitions over iterator = the Scala analog of
  * `mapInPandas` batch processing; one task per partition, rows streamed,
  * never materialized whole). The codec itself is a DETERMINISTIC FAKE
  * (clearly marked below): the container has no image/audio libraries, so
  * `decode` derives metadata and `features` derives a fixed-dim vector from
  * the bytes with pure arithmetic. Swapping in a real codec changes only
  * the two marked functions.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: String,
      media_ref: String,
      media_type: String,        // "image" | "audio" | "video"
      bytes: Array[Byte])

  final case class DecodedRow(
      doc_id: String,
      media_ref: String,
      media_type: String,
      byte_len: Int,
      width: Int,                // image/video
      height: Int,
      duration_ms: Long,         // audio/video
      checksum: Long)

  final case class FrameRow(
      doc_id: String,
      media_ref: String,
      frame_idx: Int,
      frame_offset_ms: Long,
      frame_bytes: Array[Byte])

  // ---- DETERMINISTIC FAKE CODEC (swap for a real decoder off-sandbox) -----

  /** FAKE image/audio decode: metadata from byte arithmetic. */
  private[ops] def fakeDecode(r: MediaRow): DecodedRow = {
    val n = r.bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum = sum * 31 + (r.bytes(i) & 0xff); i += 1 }
    DecodedRow(r.doc_id, r.media_ref, r.media_type,
      byte_len = n,
      width = if (r.media_type == "audio") 0 else 16 + math.floorMod(sum, 1024).toInt,
      height = if (r.media_type == "audio") 0 else 16 + math.floorMod(sum >> 10, 1024).toInt,
      duration_ms = if (r.media_type == "image") 0L else 100L + math.floorMod(sum, 60000L),
      checksum = sum)
  }

  /** FAKE feature extraction: `dim` floats from rolling byte statistics. */
  private[ops] def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  // ---- real Spark plumbing --------------------------------------------------

  /** Decode a media table in partition-batches. Repartitions by doc_id hash
    * first so batches are balanced regardless of upstream skew (media blobs
    * cluster by crawl host).
    */
  def decode(media: Dataset[MediaRow], partitions: Int = 0): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("doc_id")) else media
    balanced.mapPartitions(_.map(fakeDecode))
  }

  /** Feature-extract into an embedding column (array<float>, fixed dim) —
    * output feeds [[Similarity]] directly.
    */
  def features(media: Dataset[MediaRow], dim: Int = 32): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      (r.doc_id, r.media_ref, fakeFeatures(r.bytes, dim).toSeq)))
      .toDF("doc_id", "media_ref", "embedding")
  }

  /** Frame-sample video/audio rows: n evenly spaced frames per blob
    * (flatMap = the UDTF shape; one output row per frame).
    */
  def frameSample(media: Dataset[MediaRow], nFrames: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(r => r.media_type != "image").flatMap { r =>
      val d = fakeDecode(r)
      val chunk = math.max(1, r.bytes.length / math.max(nFrames, 1))
      (0 until nFrames).map { f =>
        val from = math.min(f * chunk, math.max(r.bytes.length - 1, 0))
        val until = math.min(from + chunk, r.bytes.length)
        FrameRow(r.doc_id, r.media_ref, f,
          d.duration_ms * f / math.max(nFrames, 1),
          java.util.Arrays.copyOfRange(r.bytes, from, until))
      }
    }
  }

  /** Deterministic synthetic media table derived from a documents table
    * (text bytes stand in for blobs; type round-robins by id).
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .map { case (id, text) =>
        // type from the numeric id (deterministic + SQL-expressible);
        // non-numeric ids fall back to a length round-robin
        val n = id.toLongOption.getOrElse(id.length.toLong)
        val t = math.floorMod(n, 3L) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, s"media://$id", t, text.getBytes("UTF-8"))
      }
  }
}
