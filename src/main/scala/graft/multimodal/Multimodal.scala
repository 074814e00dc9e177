package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * frame-sampling stages as typed mapPartitions kernels.
  *
  * The *plumbing* is real and scale-shaped — binary columns ride
  * parquet; kernels iterate partition batches exactly where a PySpark
  * pipeline would run `mapInPandas` with an image/audio codec; outputs
  * are columnar rows with explicit schemas. The *codecs* are
  * deterministic STUBs (this container has no image/audio libraries):
  * decode derives dimensions arithmetically from payload size, features
  * from a rolling hash. Swap `decodeKernel`/`featureKernel` for real
  * codecs and nothing else changes.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int, channels: Int)
  case class Features(media_id: Long, feature: Array[Float])

  /** Manufacture a media table from the documents table (payload =
    * UTF-8 bytes; kind round-robins image/audio/video). Stands in for a
    * real blob-store scan. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: dimensions derived from payload length (a real codec
    * parses the header here). Kept arithmetic-in-length so the driver
    * oracle can check the full pipeline end-to-end in SQL. */
  private def decodeKernel(r: MediaRow): Decoded = {
    val n = r.payload.length
    Decoded(r.media_id, r.kind,
      width = 64 + n % 192,
      height = 64 + (n / 7) % 192,
      channels = if (r.kind == "image") 3 else 1)
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

  /** STUB feature extraction: `dim` floats from a rolling hash over the
    * payload (a real pipeline embeds pixels/audio frames here). */
  def features(media: DataFrame, dim: Int = 8): Dataset[Features] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val f = new Array[Float](dim)
          var h = 1125899906842597L
          var i = 0
          while (i < r.payload.length) {
            h = h * 31 + r.payload(i)
            f(i % dim) += (h & 0xffff).toFloat / 65536.0f
            i += 1
          }
          Features(r.media_id, f)
        }
      }
  }

  /** Video frame sampling as pure column ops: split the payload into
    * `frameBytes` chunks, keep every `stride`-th. Returns
    * (media_id, n_frames, n_sampled, sampled_offsets). */
  def frameSample(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media.select(
        col("media_id"),
        ceil(length(col("payload")).cast("double") / frameBytes).cast("long").as("n_frames"))
      .withColumn("sampled_offsets",
        filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0))
      .withColumn("n_sampled", size(col("sampled_offsets")).cast("long"))
      .select("media_id", "n_frames", "n_sampled", "sampled_offsets")
}
