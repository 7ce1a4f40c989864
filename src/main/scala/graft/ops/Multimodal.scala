package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape (mapPartitions over iterator = the Scala analog of `mapInPandas`
  * batch processing; one task per partition, rows streamed, never
  * materialized whole). The codec is a REAL header codec over minimal
  * standard containers — BMP (BITMAPINFOHEADER), WAV (RIFF/WAVE fmt+data),
  * and a RIFF/AVI main header — written by [[Codec]] at synthesis time and
  * re-parsed byte-for-byte by [[decode]] (magic dispatch, little-endian
  * fields, RIFF chunk walking). Only the media CONTENT is synthetic (the
  * container has no image/audio libraries to produce real pixels/samples);
  * the parsing behaves exactly as it would on a real minimal file of the
  * same format. [[features]] remains a deterministic stand-in for a learned
  * embedding.
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
      media_type: String,        // derived from the container magic, not trusted from the row
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

  // ---- REAL minimal-container codec ----------------------------------------
  //
  // Encoders emit spec-shaped headers (every field a real field at its real
  // offset); the decoder dispatches on magic bytes and walks RIFF chunks, so
  // it also decodes any externally produced minimal BMP/WAV of the same
  // layout. No inter-chunk padding is written (sizes stay exact), and the
  // payload rides as the final data chunk.

  object Codec {
    private def le(buf: java.nio.ByteBuffer) = buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)

    /** minimal 24-bpp BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
      * payload as the pixel array (54 + n bytes).
      */
    def encodeBmp(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      val buf = le(java.nio.ByteBuffer.allocate(54 + payload.length))
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(54 + payload.length) // bfSize
      buf.putInt(0)                   // bfReserved1/2
      buf.putInt(54)                  // bfOffBits
      buf.putInt(40)                  // biSize
      buf.putInt(width)               // biWidth
      buf.putInt(height)              // biHeight
      buf.putShort(1)                 // biPlanes
      buf.putShort(24)                // biBitCount
      buf.putInt(0)                   // biCompression = BI_RGB
      buf.putInt(payload.length)      // biSizeImage
      buf.putInt(2835).putInt(2835)   // 72 dpi
      buf.putInt(0).putInt(0)         // biClrUsed/Important
      buf.put(payload)
      buf.array()
    }

    /** minimal PCM WAV: RIFF/WAVE + 16-byte fmt chunk (mono 16-bit 8 kHz)
      * + data chunk (44 + n bytes).
      */
    val WavSampleRate = 8000
    val WavByteRate: Int = WavSampleRate * 2 // mono, 16-bit

    def encodeWav(payload: Array[Byte]): Array[Byte] = {
      val buf = le(java.nio.ByteBuffer.allocate(44 + payload.length))
      buf.put("RIFF".getBytes("US-ASCII"))
      buf.putInt(36 + payload.length)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII"))
      buf.putInt(16)                  // PCM fmt chunk size
      buf.putShort(1)                 // wFormatTag = PCM
      buf.putShort(1)                 // nChannels
      buf.putInt(WavSampleRate)
      buf.putInt(WavByteRate)
      buf.putShort(2)                 // nBlockAlign
      buf.putShort(16)                // wBitsPerSample
      buf.put("data".getBytes("US-ASCII"))
      buf.putInt(payload.length)
      buf.put(payload)
      buf.array()
    }

    /** RIFF/AVI main header: avih chunk (56 bytes — µs/frame, totalFrames,
      * width, height at their spec offsets) + payload as a movi chunk
      * (84 + n bytes).
      */
    val AviUsecPerFrame = 40000 // 25 fps

    def encodeAvi(totalFrames: Int, width: Int, height: Int,
        payload: Array[Byte]): Array[Byte] = {
      val buf = le(java.nio.ByteBuffer.allocate(84 + payload.length))
      buf.put("RIFF".getBytes("US-ASCII"))
      buf.putInt(76 + payload.length)
      buf.put("AVI ".getBytes("US-ASCII"))
      buf.put("avih".getBytes("US-ASCII"))
      buf.putInt(56)
      buf.putInt(AviUsecPerFrame)     // dwMicroSecPerFrame
      buf.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
      buf.putInt(totalFrames)         // dwTotalFrames
      buf.putInt(0).putInt(1)         // initialFrames, streams
      buf.putInt(0)                   // suggestedBufferSize
      buf.putInt(width)               // dwWidth
      buf.putInt(height)              // dwHeight
      buf.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
      buf.put("movi".getBytes("US-ASCII"))
      buf.putInt(payload.length)
      buf.put(payload)
      buf.array()
    }

    /** Nearest-neighbor BMP downsample by an integer factor: header fields
      * re-derived exactly (out dims ⌈w/f⌉×⌈h/f⌉ — the source index of out
      * pixel x is x·f, and ⌈w/f⌉ is the largest count keeping every source
      * index < w), payload decimated to every f-th byte, re-encoded through
      * [[encodeBmp]]. The header arithmetic and re-encode are REAL; the
      * payload step is the clearly-marked deterministic stand-in — the
      * synthetic payload is not a w·h·3 pixel grid, so byte decimation
      * stands in for row/column sampling, and a real image library
      * replaces exactly this loop (and only it).
      */
    def resizeBmp(b: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, "factor must be >= 1")
      require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP blob")
      if (factor == 1) return b
      val w = leInt(b, 18)
      val h = leInt(b, 22)
      val off = leInt(b, 10) // bfOffBits — trust the header, not a constant
      require(off >= 54 && off <= b.length, s"corrupt bfOffBits $off")
      val n = b.length - off
      val outLen = (n + factor - 1) / factor
      val sampled = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { sampled(i) = b(off + i * factor); i += 1 }
      encodeBmp((w + factor - 1) / factor, (h + factor - 1) / factor, sampled)
    }

    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** rolling 31-fold over every byte — content identity for dedup joins. */
    def checksum(b: Array[Byte]): Long = {
      var sum = 0L
      var i = 0
      while (i < b.length) { sum = sum * 31 + (b(i) & 0xff); i += 1 }
      sum
    }

    /** Parse (media_type, width, height, duration_ms) from the container
      * header — magic dispatch, then fixed-offset reads (BMP) or a RIFF
      * chunk walk (WAV/AVI). Unknown magic → IllegalArgumentException: a
      * decode stage must fail loudly on garbage, not fabricate metadata.
      */
    /** Offset and size of a WAV blob's PCM data chunk (RIFF walk). */
    def wavDataChunk(b: Array[Byte]): (Int, Int) = {
      require(b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE",
        "not a WAV blob")
      var off = 12
      while (off + 8 <= b.length) {
        val id = fourcc(b, off)
        val size = leInt(b, off + 4)
        require(size >= 0, s"corrupt RIFF chunk size $size at offset $off")
        if (id == "data") return (off + 8, size)
        off += 8 + size
      }
      throw new IllegalArgumentException("WAV missing data chunk")
    }

    def parse(b: Array[Byte]): (String, Int, Int, Long) = {
      require(b.length >= 12, s"short media blob: ${b.length} bytes")
      if (b(0) == 'B' && b(1) == 'M') {
        ("image", leInt(b, 18), leInt(b, 22), 0L)
      } else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE") {
        var off = 12
        var byteRate = 0
        var dataSize = -1
        while (off + 8 <= b.length && (byteRate == 0 || dataSize < 0)) {
          val id = fourcc(b, off)
          val size = leInt(b, off + 4)
          // a negative/overflowing chunk size must FAIL, not stall the walk
          // (off would stop advancing and the task would hang forever)
          require(size >= 0, s"corrupt RIFF chunk size $size at offset $off")
          if (id == "fmt ") byteRate = leInt(b, off + 16)
          else if (id == "data") dataSize = size
          off += 8 + size
        }
        require(byteRate > 0 && dataSize >= 0, "WAV missing fmt /data chunk")
        ("audio", 0, 0, dataSize.toLong * 1000L / byteRate)
      } else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") {
        var off = 12
        var out: (String, Int, Int, Long) = null
        while (off + 8 <= b.length && out == null) {
          val id = fourcc(b, off)
          val size = leInt(b, off + 4)
          require(size >= 0, s"corrupt RIFF chunk size $size at offset $off")
          if (id == "avih") {
            val usec = leInt(b, off + 8)
            val frames = leInt(b, off + 24)
            out = ("video", leInt(b, off + 40), leInt(b, off + 44),
              frames.toLong * usec / 1000L)
          }
          off += 8 + size
        }
        require(out != null, "AVI missing avih chunk")
        out
      } else throw new IllegalArgumentException(
        s"unknown container magic: ${fourcc(b, 0)}")
    }
  }

  private[ops] def decodeOne(r: MediaRow): DecodedRow = {
    val (tpe, w, h, dur) = Codec.parse(r.bytes)
    DecodedRow(r.doc_id, r.media_ref, tpe, r.bytes.length, w, h, dur,
      Codec.checksum(r.bytes))
  }

  /** deterministic STAND-IN for a learned embedding: `dim` floats of rolling
    * byte statistics (a real model replaces exactly this function).
    */
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
    balanced.mapPartitions(_.map(decodeOne))
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

  /** Sample-level audio analysis: decode each WAV clip's 16-bit LE PCM
    * data chunk and reduce it to integer-exact per-clip stats — sample
    * count, Σ|amplitude|, peak |amplitude|, and strict sign-change count
    * (the silence/clipping screens an audio curation pipeline runs before
    * training). Dispatches on the container magic like [[decode]]; non-WAV
    * rows and zero-sample clips are dropped. Same partition-batch shape
    * (mapPartitions streams blobs, one bounded row out per clip), so the
    * reduction is entirely map-side — no shuffle at all.
    */
  def audioStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val b = r.bytes
      val isWav = b.length >= 12 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'A' &&
        b(10) == 'V' && b(11) == 'E'
      if (!isWav) None
      else {
        val (off, size) = Codec.wavDataChunk(b)
        val n = math.min(size, b.length - off) / 2
        if (n == 0) None
        else {
          var i = 0; var sumAbs = 0L; var peak = 0L; var cross = 0L
          var prev = 0
          while (i < n) {
            val s = ((b(off + 2 * i + 1).toInt << 8) |
              (b(off + 2 * i) & 0xff))
            val a = math.abs(s.toLong)
            sumAbs += a
            if (a > peak) peak = a
            if (i > 0 && s.toLong * prev < 0) cross += 1
            prev = s
            i += 1
          }
          Some((r.doc_id, n.toLong, sumAbs, peak, cross))
        }
      }
    }).toDF("doc_id", "n_samples", "sum_abs", "peak", "zero_crossings")
  }

  /** Resize image rows by an integer factor — a blob→blob stage
    * (MediaRow → MediaRow), so it composes with [[decode]]/[[features]]/
    * [[frameSample]] downstream exactly like a thumbnailing step in a real
    * media pipeline. Images go through [[Codec.resizeBmp]] (real header
    * arithmetic, marked-fake pixel decimation); audio/video rows pass
    * through unchanged — resize is an image transform, and silently
    * re-coding other modalities would corrupt them. Dispatch is on the
    * container magic, not the untrusted `media_type` column, mirroring
    * [[decode]]. Same partition-batch shape as [[decode]] (mapPartitions,
    * rows streamed).
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, "factor must be >= 1")
    import media.sparkSession.implicits._
    if (factor == 1) media
    else media.mapPartitions(_.map { r =>
      val isBmp = r.bytes.length >= 54 && r.bytes(0) == 'B' && r.bytes(1) == 'M'
      if (!isBmp) r
      else r.copy(bytes = Codec.resizeBmp(r.bytes, factor))
    })
  }

  /** Frame-sample video/audio rows: n evenly spaced frames per blob
    * (flatMap = the UDTF shape; one output row per frame), offsets spaced
    * over the REAL header-parsed duration.
    */
  def frameSample(media: Dataset[MediaRow], nFrames: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(r => r.media_type != "image").flatMap { r =>
      val d = decodeOne(r)
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

  /** Interleaved-sequence token accounting: the per-doc sequence length a
    * multimodal training pipeline budgets with BEFORE packing — text spans
    * cost whitespace tokens, media spans cost tokens derived from the REAL
    * decoded headers with the standard vision/audio accounting:
    * image = ⌈w/patch⌉·⌈h/patch⌉ patch tokens (the ViT grid), audio =
    * ⌈duration/audioMsPerToken⌉ frame tokens (80 ms ≈ 12.5 Hz codec
    * frames), video = ⌈duration/videoFrameMs⌉ sampled frames × the patch
    * grid. All-integer column arithmetic over decode's parsed header
    * fields — no UDF, one 1:1 equi-join on doc_id (both sides already
    * hash-partition by it at scale; the join IS the only exchange).
    * Output feeds [[graft.ops.Sampling.shardByTokens]] /
    * `selectByTokenBudget` directly as the token-weight column.
    */
  def interleavedTokens(docs: DataFrame, decoded: DataFrame,
      patch: Int = 16, audioMsPerToken: Long = 80L,
      videoFrameMs: Long = 1000L): DataFrame = {
    require(patch > 0 && audioMsPerToken > 0 && videoFrameMs > 0,
      "token accounting units must be positive")
    // all quantities non-negative, so truncating `div` IS ceil-div here
    val patches = expr(
      s"CAST(((width + ${patch - 1}) div $patch) * " +
      s"((height + ${patch - 1}) div $patch) AS BIGINT)")
    val mediaToks = when(col("media_type") === "image", patches)
      .when(col("media_type") === "audio", expr(
        s"(duration_ms + ${audioMsPerToken - 1}L) div ${audioMsPerToken}L"))
      .otherwise(expr(
        s"(duration_ms + ${videoFrameMs - 1}L) div ${videoFrameMs}L") * patches)
    val text = docs.select(col("doc_id").cast("string").as("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("text_tokens"))
    // LEFT join (round-5 ADVICE): a doc with no media row keeps its text
    // tokens with media_tokens = 0 instead of silently vanishing from the
    // accounting (and thus from weighted budget selection). Identical
    // output on 1:1 doc↔media tables (the oracle-checked shape); a doc
    // with several media rows still counts once per media row by design.
    text.join(
        decoded.select(col("doc_id"), col("media_type"),
          mediaToks.as("media_tokens")),
        Seq("doc_id"), "left")
      .withColumn("media_tokens", coalesce(col("media_tokens"), lit(0L)))
      .withColumn("total_tokens", col("text_tokens") + col("media_tokens"))
      .select("doc_id", "media_type", "text_tokens", "media_tokens",
        "total_tokens")
  }

  /** Deterministic synthetic media table derived from a documents table:
    * the text bytes become the payload of a REAL minimal container —
    * BMP / WAV / AVI round-robin by id — whose header fields derive from
    * the payload length (SQL-expressible, so [[decode]]'s parsed metadata
    * is DuckDB-oracle-checkable):
    * image/video width = 16 + n%512, height = 16 + (3n)%512;
    * audio duration = n·1000/16000 ms; video frames = 10 + n%240 at 25 fps.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .map { case (id, text) =>
        // type from the numeric id (deterministic + SQL-expressible);
        // non-numeric ids fall back to a length round-robin
        val nId = id.toLongOption.getOrElse(id.length.toLong)
        val payload = text.getBytes("UTF-8")
        val n = payload.length
        val w = 16 + n % 512
        val h = 16 + (3 * n) % 512
        val (t, bytes) = math.floorMod(nId, 3L) match {
          case 0 => ("image", Codec.encodeBmp(w, h, payload))
          case 1 => ("audio", Codec.encodeWav(payload))
          case _ => ("video", Codec.encodeAvi(10 + n % 240, w, h, payload))
        }
        MediaRow(id, s"media://$id", t, bytes)
      }
  }
}
