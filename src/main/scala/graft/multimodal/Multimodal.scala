package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * frame-sampling stages as typed mapPartitions kernels.
  *
  * The *plumbing* is real and scale-shaped — binary columns ride
  * parquet; kernels iterate partition batches exactly where a PySpark
  * pipeline would run `mapInPandas` with an image/audio codec; outputs
  * are columnar rows with explicit schemas.
  *
  * The payload is a REAL container: a valid 54-byte BMP header
  * (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian) followed by the
  * sample data, and `decode` parses the header fields with ByteBuffer —
  * an actual byte-level format parse, not arithmetic on length. The
  * sample data is manufactured from document text; the dimension VALUES
  * written at encode time are derived from the data length by fixed
  * formulas, which is what keeps the full encode→parquet→decode
  * round-trip oracle-checkable in SQL.
  *
  * This object carries the container/framing tier (header parse, frame
  * sampling). The PIXEL tier — real PNG codec decode, true 2-D
  * nearest-neighbor resize, per-channel statistics via javax.imageio —
  * lives in [[PixelImage]].
  */
object Multimodal {

  /** BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40). */
  val HeaderBytes = 54

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int, channels: Int)

  /** Build a valid BMP header + data payload with explicit dimensions;
    * bits-per-pixel carries channels·8. The data section is raw samples
    * (no BMP row padding — documented deviation; header fields are what
    * real-world probes like `identify` read anyway). */
  private[multimodal] def bmpWrapDims(
      data: Array[Byte], channels: Int, width: Int, height: Int): Array[Byte] = {
    val n = data.length
    val out = ByteBuffer.allocate(HeaderBytes + n).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(HeaderBytes + n)       // file size
    out.putInt(0)                     // reserved
    out.putInt(HeaderBytes)           // data offset
    out.putInt(40)                    // info header size
    out.putInt(width)
    out.putInt(height)
    out.putShort(1)                   // planes
    out.putShort((channels * 8).toShort) // bits per pixel
    out.putInt(0)                     // compression = BI_RGB
    out.putInt(n)                     // image data size
    out.putInt(2835).putInt(2835)     // pixels/metre
    out.putInt(0).putInt(0)           // palette sizes
    out.put(data)
    out.array()
  }

  /** Encode-time wrapper: width/height are fixed formulas of the data
    * length (64 + n % 192, 64 + (n/7) % 192) — what keeps the
    * encode→parquet→decode round-trip oracle-checkable in SQL. */
  private[multimodal] def bmpWrap(data: Array[Byte], channels: Int): Array[Byte] =
    bmpWrapDims(data, channels, 64 + data.length % 192, 64 + (data.length / 7) % 192)

  /** Manufacture a media table from the documents table (data = UTF-8
    * bytes wrapped in a BMP container; kind round-robins
    * image/audio/video). Stands in for a real blob-store scan. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    // Null text wraps an EMPTY data section (valid header, zero
    // samples) rather than NPE-ing inside the UDF: a missing blob is a
    // data condition, not a pipeline crash, and decode still parses it.
    val wrap = udf { (text: String, kind: String) =>
      val data = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
      bmpWrap(data, if (kind == "image") 3 else 1)
    }
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text"))
      .select(col("media_id"), col("kind"),
        wrap(col("text"), col("kind")).as("payload"))
  }

  /** REAL header parse: validates the magic and reads width / height /
    * bits-per-pixel from their BITMAPINFOHEADER offsets. Malformed
    * payloads fail loudly — a silent fallback here would hide corrupt
    * blobs until they poisoned a training run. */
  private def decodeKernel(r: MediaRow): Decoded = {
    val b = ByteBuffer.wrap(r.payload).order(ByteOrder.LITTLE_ENDIAN)
    require(r.payload.length >= HeaderBytes &&
      b.get(0) == 'B'.toByte && b.get(1) == 'M'.toByte,
      s"media ${r.media_id}: not a BMP container")
    Decoded(r.media_id, r.kind,
      width = b.getInt(18),
      height = b.getInt(22),
      channels = b.getShort(28) / 8)
  }

  /** Decode stage: typed mapPartitions — the kernel sees an iterator
    * per partition (batch-at-a-time, like mapInPandas), so a real codec
    * can amortize per-batch setup (model load, JNI handles). */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it => it.map(decodeKernel) }
  }

  /** Video frame sampling as pure column ops over the DATA section:
    * split into `frameBytes` chunks, keep every `stride`-th. Returns
    * (media_id, n_frames, n_sampled, sampled_offsets). */
  def frameSample(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media.select(
        col("media_id"),
        ceil((length(col("payload")) - HeaderBytes).cast("double") / frameBytes)
          .cast("long").as("n_frames"))
      // Guard the empty payload: sequence(0, -1) evaluates DESCENDING to
      // [0, -1], which would report one sampled frame for zero frames.
      .withColumn("sampled_offsets",
        when(col("n_frames") > 0,
          filter(sequence(lit(0L), col("n_frames") - 1), i => i % stride === 0))
          .otherwise(array().cast("array<bigint>")))
      .withColumn("n_sampled", size(col("sampled_offsets")).cast("long"))
      .select("media_id", "n_frames", "n_sampled", "sampled_offsets")

  case class SceneCuts(media_id: Long, n_frames: Long, n_cuts: Long)

  /** Scene-cut detection over the container's data section — the
    * temporal video operator: per-frame intensity (unsigned byte sum)
    * with a cut whenever consecutive frames differ by more than
    * `threshold`. The kernel re-validates the REAL container header
    * (loud failure on corrupt blobs, like decode) and walks raw bytes;
    * a production build swaps the intensity proxy for a decoded-luma
    * histogram diff without touching the dataflow. Header-only
    * payloads report (0, 0) — a missing blob is a data condition. */
  def sceneCuts(
      media: DataFrame,
      frameBytes: Int = 256,
      threshold: Long = 15000L): Dataset[SceneCuts] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions(_.map { r =>
        val b = r.payload
        require(b.length >= HeaderBytes &&
          b(0) == 'B'.toByte && b(1) == 'M'.toByte,
          s"media ${r.media_id}: not a BMP container")
        val data = b.length - HeaderBytes
        val nFrames = (data + frameBytes - 1) / frameBytes
        var prev = 0L
        var cuts = 0L
        var f = 0
        while (f < nFrames) {
          var s = 0L
          var i = HeaderBytes + f * frameBytes
          val end = math.min(HeaderBytes + (f + 1) * frameBytes, b.length)
          while (i < end) { s += b(i) & 0xff; i += 1 }
          if (f > 0 && math.abs(s - prev) > threshold) cuts += 1
          prev = s
          f += 1
        }
        SceneCuts(r.media_id, nFrames.toLong, cuts)
      })
  }
}
