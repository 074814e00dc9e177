package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Driver surface for the multimodal layer: payloads are real BMP
  * containers (54-byte header + data manufactured from `documents`
  * text), decode is a byte-level header parse, and frames/features run
  * over the data section. The header fields are written from fixed
  * formulas of the data length, so DuckDB can still oracle the full
  * encode→parquet→decode pipeline in SQL. */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // header-parsing decode over BMP payloads → per-kind shape stats.
    "mm_decode_stats" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.decode(media)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(col("width").cast("long")).as("sum_width"),
          sum(col("height").cast("long")).as("sum_height"),
          max(col("channels")).as("channels"))
    }),

    // frame sampling over binary payloads → per-media frame counts.
    "mm_frame_sample" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.frameSample(media)
        .select(col("media_id"), col("n_frames"), col("n_sampled"))
    }),

    // REAL audio tier: write each doc's deterministic synthetic clip as
    // an actual RIFF/WAVE PCM16 container, parse it back by hand (loud
    // failure on any malformed chunk), and emit per-window energy +
    // zero-crossing counts on the decoded samples — the two classic
    // integer-exact audio descriptors. The oracle replays only the
    // sample formula in integer SQL; a wrong byte in the header layout
    // or sample byte order flips the hash (PCM is lossless).
    "mm_audio_stats" -> ((s, d) => {
      val audio = graft.multimodal.WavAudio.audioFromDocuments(Tables.documents(s, d))
      graft.multimodal.WavAudio.features(audio).toDF()
        .select(col("media_id"), col("win"), col("sum_sq"), col("n_crossings"))
    }),

    // REAL 2-D resize over REAL pixels: encode each doc's deterministic
    // synthetic image as an actual PNG, ImageIO-decode it, true 2-D NN
    // resample to 16x12, re-encode, decode AGAIN, and emit per-channel
    // pixel sums. The oracle replays only the generator formula and the
    // NN index map in integer SQL — any wrong byte in the encode→decode
    // →resample→re-encode chain flips the hash (PNG is lossless).
    "mm_resize_stats" -> ((s, d) => {
      val media = graft.multimodal.PixelImage.mediaFromDocuments(Tables.documents(s, d))
      graft.multimodal.PixelImage.channelStats(
          graft.multimodal.PixelImage.resize(media, tw = 16, th = 12))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("r_sum"), col("g_sum"), col("b_sum"))
    }),

    // Perceptual-hash image dedup over REAL decoded pixels: decode each
    // PNG, 8×8 NN-resample, average-hash (bit = cell gray strictly
    // above image mean, integer compare), bucket the corpus by the
    // 64-bit signature (two positive 32-bit halves — see
    // PixelImage.aHash). The image analogue of SimHash bucketing:
    // kernels run per-row and shrink each image to 16 bytes BEFORE the
    // shuffle, so the one aggregation moves signatures, not pixels —
    // linear at 100 TB. The oracle replays generator + NN map + hash
    // packing in integer SQL; any wrong bit anywhere flips the hash.
    "mm_image_phash" -> ((s, d) => {
      val media = graft.multimodal.PixelImage.mediaFromDocuments(Tables.documents(s, d))
      graft.multimodal.PixelImage.aHash(media).toDF()
        .groupBy("phash_hi", "phash_lo")
        .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("min_media"))
    }),

    // Audio-dedup bucketing by energy-delta fingerprint over REAL
    // RIFF/PCM16-decoded samples (WavAudio.fingerprints — the
    // simplified Shazam contour hash: 16 frames of 50 samples, bit =
    // next frame strictly louder). Clips shrink to 8-byte signatures
    // in the kernel, so the one aggregation moves fingerprints, not
    // audio. Oracle replays clip formula + frame energies + packing in
    // integer SQL.
    "mm_audio_fingerprint" -> ((s, d) => {
      val audio = graft.multimodal.WavAudio.audioFromDocuments(Tables.documents(s, d))
      graft.multimodal.WavAudio.fingerprints(audio).toDF()
        .groupBy("fp")
        .agg(count(lit(1)).as("n_clips"), min(col("media_id")).as("min_clip"))
    }),

    // Silence-split segmentation over the REAL audio tier — the
    // VAD/clip-trimming pass before training: frames classify voiced
    // on integer energy vs the corpus-median threshold, segments are
    // maximal voiced runs. The full RIFF decode chain is under the
    // hash (a wrong byte flips frame energies); the oracle replays the
    // generator formula + a gaps-and-islands run-length in SQL.
    "mm_audio_silence" -> ((s, d) => {
      val audio = graft.multimodal.WavAudio.audioFromDocuments(Tables.documents(s, d))
      graft.multimodal.WavAudio.silenceSegments(audio).toDF()
        .select(col("media_id"), col("n_frames"), col("n_voiced"),
          col("n_segments"), col("longest"))
    }),

    // Scene-cut detection over the video tier's REAL containers: the
    // kernel validates each BMP header, walks the data section in
    // 256-byte frames, and flags cuts where consecutive frame
    // intensities (unsigned byte sums) jump by > 15000 — the temporal
    // video operator (a production build swaps the intensity proxy for
    // decoded-luma histogram diffs on the same dataflow). Per-row
    // kernel, integer outputs, one result projection — no shuffle at
    // all; the oracle replays intensities from the text bytes (ASCII
    // corpus: byte == code point).
    "mm_scene_cuts" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(
        Tables.documents(s, d)).where(col("kind") === "video")
      Multimodal.sceneCuts(media).toDF()
        .select(col("media_id"), col("n_frames"), col("n_cuts"))
    }),

    // NEAR-duplicate image pairs by Hamming distance over the aHash
    // signatures — with an EXACT banding guarantee: the 64 bits split
    // into four 16-bit bands, and any pair within Hamming ≤ 3 differs
    // in at most 3 bands, so by pigeonhole it MUST agree on at least
    // one band — the band equi-join therefore finds every such pair
    // (SimHash-style banding, but here as a completeness proof, not a
    // heuristic). Candidates join on (band_idx, band_value) — never
    // all-pairs — then the exact popcount filter keeps Hamming ≤ 3.
    // Output is the pair census per distance (bounded, stable).
    "mm_image_near_dup" -> ((s, d) => {
      val sigs = graft.CacheRegistry.persistTracked(
        graft.multimodal.PixelImage.aHash(
            graft.multimodal.PixelImage.mediaFromDocuments(Tables.documents(s, d)))
          .toDF().select(col("phash_hi").as("hi"), col("phash_lo").as("lo"))
          .distinct())
      val banded = sigs.select(col("hi"), col("lo"), explode(array(
        struct(lit(0).as("bi"), expr("hi div 65536").as("bv")),
        struct(lit(1).as("bi"), pmod(col("hi"), lit(65536L)).as("bv")),
        struct(lit(2).as("bi"), expr("lo div 65536").as("bv")),
        struct(lit(3).as("bi"), pmod(col("lo"), lit(65536L)).as("bv")))).as("b"))
        .select(col("hi"), col("lo"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      banded.as("x").join(banded.as("y"),
          col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
            (col("x.hi") < col("y.hi") ||
              (col("x.hi") === col("y.hi") && col("x.lo") < col("y.lo"))))
        .select(col("x.hi").as("ha"), col("x.lo").as("la"),
          col("y.hi").as("hb"), col("y.lo").as("lb"))
        .distinct()
        .select((bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb")))
          .cast("long").as("hamming"))
        .where(col("hamming") <= 3)
        .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    }),

    // Per-channel corpus means over REAL ImageIO-decoded pixels: decode
    // every PNG, sum each channel, divide the exact integer totals once
    // on both engines. n_pixels counts every (x, y) position.
    "mm_feature_means" -> ((s, d) => {
      val media = graft.multimodal.PixelImage.mediaFromDocuments(Tables.documents(s, d))
      graft.multimodal.PixelImage.channelStats(media).toDF()
        .select(col("width").cast("long").as("wl"), col("height").cast("long").as("hl"),
          col("r_sum"), col("g_sum"), col("b_sum"))
        // coalesce: empty corpus sums are NULL while the oracle's
        // count-derived pixel total is 0 (r13 empty axis); the means
        // stay NULL/0 = NULL on both engines.
        // int64-envelope certification (r17 raw-sum(int-product)
        // audit): per-row wl·hl is one image's pixel count (< 1e10
        // even at absurd dimensions); the corpus total at 100 TB of
        // PNG-compressed pixels is ≈ 50× the stored bytes ≈ 1.7e15
        // px, and the channel sums ≤ 255× that ≈ 4e17 — both > 20×
        // inside int64. n_pixels is also the BIGINT output contract,
        // so widening here would only move the wrap to the output
        // cast. No wrap at 100 TB.
        .agg(coalesce(sum(col("wl") * col("hl")), lit(0L)).as("n_pixels"),
          sum(col("r_sum")).as("rs"), sum(col("g_sum")).as("gs"),
          sum(col("b_sum")).as("bs"))
        .select(
          (col("rs").cast("double") / col("n_pixels")).as("r_mean"),
          (col("gs").cast("double") / col("n_pixels")).as("g_mean"),
          (col("bs").cast("double") / col("n_pixels")).as("b_mean"),
          col("n_pixels"))
    }))

  /** The aHash replay chain (generator pixels → 8×8 NN → gray bits →
    * packed halves), shared by the phash and near-dup oracles. */
  private val phashCtes =
    """c AS (
      |  SELECT doc_id AS id,
      |    16 + doc_id % 16 AS w, 12 + (doc_id // 3) % 12 AS h
      |  FROM documents),
      |g AS (
      |  SELECT c.id, pp.p,
      |    ((c.id * 31 + (((pp.p % 8) * c.w) // 8) * 7
      |      + (((pp.p // 8) * c.h) // 8) * 13) % 256
      |   + (c.id * 31 + (((pp.p % 8) * c.w) // 8) * 7
      |      + (((pp.p // 8) * c.h) // 8) * 13 + 101) % 256
      |   + (c.id * 31 + (((pp.p % 8) * c.w) // 8) * 7
      |      + (((pp.p // 8) * c.h) // 8) * 13 + 202) % 256) AS gray
      |  FROM c, range(0, 64) pp(p)),
      |t AS (SELECT id, sum(gray) AS total FROM g GROUP BY id),
      |b AS (
      |  SELECT g.id, g.p,
      |    CASE WHEN 64 * g.gray > t.total THEN 1 ELSE 0 END AS bit
      |  FROM g JOIN t ON g.id = t.id),
      |hp AS (
      |  SELECT id,
      |    CAST(sum(CASE WHEN p < 32 THEN bit * (1::BIGINT << (31 - p)) ELSE 0 END) AS BIGINT) AS phash_hi,
      |    CAST(sum(CASE WHEN p >= 32 THEN bit * (1::BIGINT << (63 - p)) ELSE 0 END) AS BIGINT) AS phash_lo
      |  FROM b GROUP BY id)""".stripMargin

  override def oracles: Map[String, String] = Map(
    // Integer replay of the clip formula — every constant interpolated
    // from WavAudio so a coefficient change recompiles INTO the oracle
    // instead of silently desynchronizing it. Energy is Σ s²; crossings
    // count strict sign changes between consecutive samples inside a
    // window (i mod WindowSize ≠ 0 keeps the pair in-window).
    "mm_audio_stats" -> {
      import graft.multimodal.WavAudio._
      s"""WITH i AS (SELECT unnest(range($numSamples)) AS i),
         |s AS (
         |  SELECT doc_id, i,
         |    ((doc_id * $MulId + i * $MulIdx) % $Levels - ${Levels / 2}) * $Gain AS v
         |  FROM documents CROSS JOIN i),
         |p AS (
         |  SELECT doc_id, i, v, i // $WindowSize AS win,
         |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         |  FROM s)
         |SELECT doc_id AS media_id, CAST(win AS BIGINT) AS win,
         |  CAST(sum(v * v) AS BIGINT) AS sum_sq,
         |  CAST(sum(CASE WHEN i % $WindowSize <> 0 AND pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings
         |FROM p GROUP BY 1, 2""".stripMargin
    },
    // strlen (UTF-8 BYTES), not length (code points): the payload's
    // data section is text.getBytes("UTF-8"), so the dimension formulas
    // run on byte counts — on multibyte text length() undercounts (the
    // r13 unicode axis caught the split; é is 2 bytes, an emoji 4).
    "mm_decode_stats" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    coalesce(strlen(text), 0) AS n
        |  FROM documents)
        |SELECT kind, count(*) AS n,
        |  CAST(sum(64 + n % 192) AS BIGINT) AS sum_width,
        |  CAST(sum(64 + (n // 7) % 192) AS BIGINT) AS sum_height,
        |  max(CASE WHEN kind = 'image' THEN 3 ELSE 1 END) AS channels
        |FROM m GROUP BY kind""".stripMargin,

    // the 2-D NN resample replayed in integer SQL: target pixel (x, y)
    // reads source (x·w//16, y·h//12); the value is the generator
    // formula at those coordinates.
    "mm_resize_stats" ->
      """WITH c AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + (doc_id // 3) % 12 AS h
        |  FROM documents),
        |px AS (
        |  SELECT c.media_id, ch.c AS ch,
        |    (c.media_id * 31 + ((t.x * c.w) // 16) * 7
        |     + ((u.y * c.h) // 12) * 13 + ch.c * 101) % 256 AS v
        |  FROM c, range(0, 16) t(x), range(0, 12) u(y), range(0, 3) ch(c))
        |SELECT media_id, CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
        |  CAST(sum(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS r_sum,
        |  CAST(sum(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS g_sum,
        |  CAST(sum(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS b_sum
        |FROM px GROUP BY 1""".stripMargin,

    // coalesce: NULL text wraps an EMPTY data section (the
    // mediaFromDocuments contract) — zero frames, zero sampled.
    // strlen = UTF-8 bytes, the unit the payload's frames are cut in.
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST(ceil(coalesce(strlen(text), 0) * 1.0 / 256) AS BIGINT) AS n_frames,
        |  CAST(ceil(ceil(coalesce(strlen(text), 0) * 1.0 / 256) / 4.0) AS BIGINT) AS n_sampled
        |FROM documents""".stripMargin,

    // the fingerprint chain in integer SQL: clip formula → 50-sample
    // frame energies → strict-increase bits packed big-endian.
    "mm_audio_fingerprint" -> {
      import graft.multimodal.WavAudio._
      s"""WITH i AS (SELECT unnest(range($numSamples)) AS i),
         |s AS (
         |  SELECT doc_id, i,
         |    ((doc_id * $MulId + i * $MulIdx) % $Levels - ${Levels / 2}) * $Gain AS v
         |  FROM documents CROSS JOIN i),
         |e AS (SELECT doc_id, i // $FrameWin AS w, sum(v * v) AS e
         |      FROM s GROUP BY 1, 2),
         |d AS (
         |  SELECT a.doc_id, a.w,
         |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
         |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.w = a.w + 1),
         |fp AS (
         |  SELECT doc_id,
         |    CAST(sum(bit * (1::BIGINT << ($numFrames - 2 - CAST(w AS INT)))) AS BIGINT) AS fp
         |  FROM d GROUP BY 1)
         |SELECT fp, count(*) AS n_clips, min(doc_id) AS min_clip
         |FROM fp GROUP BY 1""".stripMargin
    },

    // generator-formula frame energies + gaps-and-islands run length:
    // segment id = frame index minus voiced-rank (constant within a
    // maximal voiced run).
    "mm_audio_silence" -> {
      import graft.multimodal.WavAudio._
      s"""WITH i AS (SELECT unnest(range($numSamples)) AS i),
         |s AS (
         |  SELECT doc_id, i,
         |    ((doc_id * $MulId + i * $MulIdx) % $Levels - ${Levels / 2}) * $Gain AS v
         |  FROM documents CROSS JOIN i),
         |e AS (SELECT doc_id, i // $FrameWin AS w, sum(v * v) AS e
         |      FROM s GROUP BY 1, 2),
         |v AS (SELECT doc_id, w,
         |        CASE WHEN e >= $SilenceThreshold THEN 1 ELSE 0 END AS voiced
         |      FROM e),
         |r AS (SELECT doc_id, w, voiced,
         |        w - row_number() OVER (PARTITION BY doc_id, voiced ORDER BY w) AS grp
         |      FROM v),
         |seg AS (SELECT doc_id, grp, count(*) AS len
         |        FROM r WHERE voiced = 1 GROUP BY 1, 2)
         |SELECT d.doc_id AS media_id,
         |  CAST($numFrames AS BIGINT) AS n_frames,
         |  CAST(coalesce(sum(seg.len), 0) AS BIGINT) AS n_voiced,
         |  CAST(coalesce(count(seg.len), 0) AS BIGINT) AS n_segments,
         |  CAST(coalesce(max(seg.len), 0) AS BIGINT) AS longest
         |FROM documents d LEFT JOIN seg ON d.doc_id = seg.doc_id
         |GROUP BY 1""".stripMargin
    },

    // the aHash chain in integer SQL: 8×8 NN indices into the generator
    // formula, gray = Σ channels, bit = 64·gray > Σgray, bits packed
    // big-endian by p = y·8 + x into two 32-bit halves.
    "mm_image_phash" ->
      s"""WITH $phashCtes
         |SELECT phash_hi, phash_lo, count(*) AS n_images,
         |  min(id) AS min_media
         |FROM hp GROUP BY 1, 2""".stripMargin,

    // frame intensities replayed from the text's UTF-8 BYTES via its
    // hex encoding (hex() of a VARCHAR is its UTF-8 byte hex; each byte
    // is two nibbles decoded with strpos) — NOT ord() over code points:
    // the kernel walks payload bytes, and on multibyte text the two
    // units disagree in both frame boundaries and values (r13 unicode
    // axis). lag() finds the cuts; zero-frame media report (0, 0).
    "mm_scene_cuts" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, hex(coalesce(text, '')) AS hx,
        |    coalesce(strlen(text), 0) AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT media_id, hx, n, unnest(range((n + 255) // 256)) AS f
        |  FROM v WHERE n > 0),
        |it AS (
        |  SELECT media_id, f,
        |    list_sum(list_transform(range(f * 256, least((f + 1) * 256, n)),
        |      i -> (strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 1 AS INT), 1)) - 1) * 16
        |         + strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 2 AS INT), 1)) - 1)) AS inten
        |  FROM fr),
        |d AS (
        |  SELECT media_id, inten,
        |    lag(inten) OVER (PARTITION BY media_id ORDER BY f) AS pinten
        |  FROM it),
        |c AS (
        |  SELECT media_id, count(*) AS n_frames,
        |    CAST(sum(CASE WHEN pinten IS NOT NULL AND abs(inten - pinten) > 15000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts
        |  FROM d GROUP BY 1)
        |SELECT media_id, n_frames, n_cuts FROM c
        |UNION ALL
        |SELECT media_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM v WHERE n = 0""".stripMargin,

    // same signatures → distinct → 16-bit band self-join (pigeonhole-
    // complete for Hamming ≤ 3) → exact popcount census.
    "mm_image_near_dup" ->
      s"""WITH $phashCtes,
         |sigs AS (SELECT DISTINCT phash_hi AS hi, phash_lo AS lo FROM hp),
         |banded AS (
         |  SELECT hi, lo, bi,
         |    CASE bi WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
         |            WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS bv
         |  FROM sigs, range(0, 4) bb(bi)),
         |cand AS (
         |  SELECT DISTINCT x.hi AS ha, x.lo AS la, y.hi AS hb, y.lo AS lb
         |  FROM banded x JOIN banded y
         |    ON x.bi = y.bi AND x.bv = y.bv
         |   AND (x.hi < y.hi OR (x.hi = y.hi AND x.lo < y.lo))),
         |ham AS (
         |  SELECT CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
         |  FROM cand)
         |SELECT hamming, count(*) AS n_pairs FROM ham
         |WHERE hamming <= 3 GROUP BY 1""".stripMargin,

    // per-channel corpus means: the generator formula summed over every
    // (x, y) position of every image, one double division at the end.
    "mm_feature_means" ->
      """WITH c AS (
        |  SELECT doc_id AS media_id,
        |    16 + doc_id % 16 AS w, 12 + (doc_id // 3) % 12 AS h
        |  FROM documents),
        |px AS (
        |  SELECT ch.c AS ch,
        |    (c.media_id * 31 + t.x * 7 + u.y * 13 + ch.c * 101) % 256 AS v
        |  FROM c, range(0, 31) t(x), range(0, 23) u(y), range(0, 3) ch(c)
        |  WHERE t.x < c.w AND u.y < c.h)
        |SELECT
        |  CAST(CAST(sum(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS DOUBLE)
        |    / (CAST(count(*) AS BIGINT) // 3) AS r_mean,
        |  CAST(CAST(sum(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS DOUBLE)
        |    / (CAST(count(*) AS BIGINT) // 3) AS g_mean,
        |  CAST(CAST(sum(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS DOUBLE)
        |    / (CAST(count(*) AS BIGINT) // 3) AS b_mean,
        |  CAST(count(*) AS BIGINT) // 3 AS n_pixels
        |FROM px""".stripMargin)
}
