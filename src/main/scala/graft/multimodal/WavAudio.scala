package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL audio kernels over REAL WAV bytes — the canonical 44-byte
  * RIFF/WAVE PCM16 container, written and parsed by hand (pure JDK, no
  * codec libraries needed: PCM16 IS the raw sample encoding).
  *
  * Same gradability design as [[PixelImage]]: the synthetic corpus
  * clips are generated from a closed-form sample formula
  * (`(((id·31 + 7i) mod 256) − 128) · 64`, int16 range), so the SQL
  * oracle replays the VALUES in pure integer arithmetic while the
  * Spark side runs the honest chain — write actual WAV containers,
  * parse them back (loud failure on any malformed chunk), compute
  * windowed features on the decoded samples. PCM is lossless: one
  * wrong byte in the header layout or sample byte order flips the
  * hash. Swap `audioFromDocuments` for a blob-store scan and the
  * kernels run unchanged on real recordings.
  *
  * Features are the two classic integer-exact audio descriptors:
  * per-window energy (sum of squared samples — the RMS numerator) and
  * zero-crossing count (the cheap voiced/unvoiced discriminator).
  * Both leave the kernel as a few scalars per window, never sample
  * rows; kernels are typed `mapPartitions` (batch-at-a-time, the
  * mapInPandas shape).
  */
object WavAudio {

  case class Audio(media_id: Long, payload: Array[Byte])
  case class AudioWindowStats(media_id: Long, win: Long, sum_sq: Long, n_crossings: Long)

  val SampleRate = 8000
  val WindowSize = 200
  val NumWindows = 4
  def numSamples: Int = WindowSize * NumWindows

  /** Generator-formula constants — the SQL oracle interpolates THESE
    * (MultimodalQueries), so a coefficient change cannot silently
    * desynchronize the two sides. */
  val MulId = 31L
  val MulIdx = 7L
  val Levels = 256L
  val Gain = 64L

  /** Frame width (samples) of the fingerprint and silence kernels —
    * hoisted into the same interpolated-constants discipline as
    * MulId/Gain/SilenceThreshold: the oracles slice frames as
    * `i // FrameWin`, so a caller-supplied width that differed from
    * this constant would silently desynchronize grading. */
  val FrameWin = 50

  /** Frame count of a full synthetic clip — the CEIL the kernels
    * compute from the DECODED sample count, interpolated into the
    * oracles so a non-divisible clip length changes both sides
    * identically (numSamples % FrameWin == 0 today, so ceil == floor,
    * but the formulas now agree by construction). */
  def numFrames: Int = (numSamples + FrameWin - 1) / FrameWin

  /** The corpus generator formula — shared with the SQL oracle via the
    * named constants above. Int16 range by construction
    * (|sample| ≤ (Levels/2)·Gain = 8192). */
  def synthSample(id: Long, i: Int): Short =
    (((id * MulId + i.toLong * MulIdx) % Levels - Levels / 2) * Gain).toShort

  def synthClip(id: Long): Array[Short] =
    Array.tabulate(numSamples)(i => synthSample(id, i))

  /** Canonical RIFF/WAVE PCM16 mono container: 44-byte header +
    * little-endian samples. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
    bb.put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(SampleRate)
    bb.putInt(SampleRate * 2) // byte rate
    bb.putShort(2)            // block align
    bb.putShort(16)           // bits per sample
    bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Real container parse — a proper RIFF chunk walk, not a fixed
    * 44-byte layout: real exporters put LIST-INFO/fact/cue chunks
    * between fmt and data, and WAVE_FORMAT_EXTENSIBLE fmt chunks run
    * longer than 16 bytes (cbSize + extension). Unknown chunks are
    * skipped (word-aligned, per RIFF); anything MALFORMED still fails
    * loudly — a silent fallback would hide corrupt blobs until they
    * poisoned a training run. */
  def decodeWav(mediaId: Long, bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 44, s"media $mediaId: truncated WAV (${bytes.length} bytes)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def chunk(): String = { val a = new Array[Byte](4); bb.get(a); new String(a, US_ASCII) }
    require(chunk() == "RIFF", s"media $mediaId: missing RIFF magic")
    bb.getInt // riff size
    require(chunk() == "WAVE", s"media $mediaId: not a WAVE container")
    var sawFmt = false
    while (bb.remaining() >= 8) {
      val id = chunk()
      val len = bb.getInt
      require(len >= 0 && bb.remaining() >= len,
        s"media $mediaId: truncated '$id' chunk (declared $len, ${bb.remaining()} left)")
      // skip a chunk body + RIFF word-align pad byte; files in the wild
      // legally omit the pad on their final chunk, so clamp to the
      // buffer instead of letting ByteBuffer throw a context-free error
      def skip(from: Int): Unit =
        bb.position(math.min(from + len + (len & 1), bb.limit()))
      id match {
        case "fmt " =>
          require(len >= 16, s"media $mediaId: fmt chunk too short ($len)")
          val start = bb.position()
          require(bb.getShort == 1, s"media $mediaId: only PCM supported")
          require(bb.getShort == 1, s"media $mediaId: only mono supported")
          bb.getInt; bb.getInt; bb.getShort // rate, byte rate, block align
          require(bb.getShort == 16, s"media $mediaId: only 16-bit supported")
          skip(start) // cbSize/extension + pad
          sawFmt = true
        case "data" =>
          require(sawFmt, s"media $mediaId: data chunk before fmt")
          require(len % 2 == 0, s"media $mediaId: odd PCM16 data length $len")
          return Array.fill(len / 2)(bb.getShort)
        case _ =>
          skip(bb.position())
      }
    }
    throw new IllegalArgumentException(s"media $mediaId: missing data chunk")
  }

  /** Windowed integer features on decoded samples: energy (Σ s²) and
    * zero-crossing count (strict sign change between consecutive
    * samples INSIDE the window). A clip that is not a whole number of
    * windows emits its trailing samples as a final SHORT window —
    * dropping them silently would contradict the loud-failure design
    * (the synthetic corpus is exact-multiple, so this only matters for
    * real recordings). */
  def windowFeatures(mediaId: Long, samples: Array[Short]): Seq[AudioWindowStats] = {
    val nWin = (samples.length + WindowSize - 1) / WindowSize
    (0 until nWin).map { w =>
      val start = w * WindowSize
      val end = math.min(start + WindowSize, samples.length)
      var sq = 0L
      var zc = 0L
      var i = start
      while (i < end) {
        val v = samples(i).toLong
        sq += v * v
        if (i > start && samples(i - 1).toLong * v < 0) zc += 1
        i += 1
      }
      AudioWindowStats(mediaId, w.toLong, sq, zc)
    }
  }

  /** Synthetic-clip media table keyed by the documents table (stands in
    * for a blob-store scan): one real WAV payload per doc. */
  def audioFromDocuments(docs: DataFrame): Dataset[Audio] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fanout before the codec kernel — same rationale as
    // PixelImage.mediaFromDocuments: the pruned id scan packs into a
    // couple of partitions and would serialize the WAV encode
    graft.Tables.fanout(docs.select(col("doc_id").as("media_id"))).as[Long]
      .mapPartitions(_.map(id => Audio(id, encodeWav(synthClip(id)))))
  }

  /** Decode → feature chain over real WAV payloads. */
  def features(audio: Dataset[Audio]): Dataset[AudioWindowStats] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.flatMap(a => windowFeatures(a.media_id, decodeWav(a.media_id, a.payload))))
  }

  case class AudioFingerprint(media_id: Long, fp: Long)

  case class AudioSegments(media_id: Long, n_frames: Long, n_voiced: Long,
      n_segments: Long, longest: Long)

  /** Median frame energy of the synthetic corpus (measured over the
    * generator formula) — a threshold that genuinely splits every clip
    * into voiced and silent frames, so the segmentation below is
    * exercised rather than degenerate. */
  val SilenceThreshold = 1086000000L

  /** Silence-split segmentation over REAL decoded samples — the
    * VAD/clip-trimming pass an audio curation pipeline runs before
    * training: `win`-sample frames classify voiced iff integer frame
    * energy (Σs²) ≥ `threshold`; segments are maximal voiced runs.
    * Per-clip outputs (frame counts, voiced census, segment count,
    * longest run) are what the downstream trim/filter stage keys on.
    * One mapPartitions pass like the other codec kernels (no Catalyst
    * expression decodes RIFF); clips shrink to 5 longs before any
    * shuffle. */
  def silenceSegments(audio: Dataset[Audio], win: Int = FrameWin,
      threshold: Long = SilenceThreshold): Dataset[AudioSegments] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.map { a =>
      val samples = decodeWav(a.media_id, a.payload)
      val nWin = (samples.length + win - 1) / win
      var nv = 0L; var nseg = 0L; var longest = 0L; var run = 0L
      var w = 0
      while (w < nWin) {
        var sq = 0L
        var i = w * win
        val end = math.min(i + win, samples.length)
        while (i < end) { val v = samples(i).toLong; sq += v * v; i += 1 }
        if (sq >= threshold) {
          nv += 1; run += 1
          if (run == 1L) nseg += 1
          if (run > longest) longest = run
        } else run = 0L
        w += 1
      }
      AudioSegments(a.media_id, nWin.toLong, nv, nseg, longest)
    })
  }

  /** Energy-delta fingerprint over REAL decoded samples — the
    * simplified Shazam/chromaprint shape: slice the clip into `win`-
    * sample frames, bit w = 1 iff frame w+1 carries STRICTLY more
    * energy than frame w (integer Σs² compare — robust to uniform gain
    * and exactly replayable), bits packed big-endian. 800-sample clips
    * at win=50 give a 15-bit signature; clips with the same loudness
    * contour collide, which is the bucketing an audio-dedup pass keys
    * on. Like the image aHash, each clip shrinks to 8 bytes BEFORE any
    * shuffle. */
  def fingerprints(audio: Dataset[Audio], win: Int = FrameWin): Dataset[AudioFingerprint] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.map { a =>
      val samples = decodeWav(a.media_id, a.payload)
      val nWin = (samples.length + win - 1) / win
      val energy = Array.tabulate(nWin) { w =>
        var sq = 0L
        var i = w * win
        val end = math.min(i + win, samples.length)
        while (i < end) { val v = samples(i).toLong; sq += v * v; i += 1 }
        sq
      }
      var fp = 0L
      var w = 0
      while (w < nWin - 1) {
        if (energy(w + 1) > energy(w)) fp |= 1L << (nWin - 2 - w)
        w += 1
      }
      AudioFingerprint(a.media_id, fp)
    })
  }
}
