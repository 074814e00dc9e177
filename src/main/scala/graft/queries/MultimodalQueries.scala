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

    // resize stage: NN-subsample every payload to a 64x64 pixel budget,
    // rewrite the header, then PROVE the rewrite by decoding the
    // resized container — dims come from the new header parse, n_bytes
    // from the new payload length, both SQL-derivable from n_chars.
    "mm_resize_stats" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      val rs = graft.CacheRegistry.persistTracked(
        Multimodal.resize(media, targetW = 64, targetH = 64).toDF())
      Multimodal.decode(rs).toDF()
        .join(rs.select(col("media_id").as("mid"),
          (length(col("payload")) - Multimodal.HeaderBytes).cast("long").as("n_bytes")),
          col("media_id") === col("mid"))
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("n_bytes"))
    }),

    // rolling-hash feature stub → per-dimension corpus means.
    // The kernel's float accumulation is EXACT (each contribution is a
    // multiple of 2^-16 and per-dim totals stay < 2^8, so every partial
    // sum fits the 24-bit float mantissa) — so v*65536 is an exact
    // integer, the corpus sum is an exact BIGINT, and the mean is one
    // identical double division on both engines. That turns a "hash-
    // derived, rows-only" query into a hard value-checked one.
    "mm_feature_means" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.features(media, dim = 8)
        .select(posexplode(col("feature")).as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(sum((col("v").cast("double") * 65536).cast("long")).as("q16"),
          count(lit(1)).as("n"))
        .select(col("dim"),
          (col("q16").cast("double") / (col("n") * 65536)).as("mean_v"),
          col("n"))
    }))

  override def oracles: Map[String, String] = Map(
    // UTF-8 length == char length here (ascii word-salad corpus).
    "mm_decode_stats" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    length(text) AS n
        |  FROM documents)
        |SELECT kind, count(*) AS n,
        |  CAST(sum(64 + n % 192) AS BIGINT) AS sum_width,
        |  CAST(sum(64 + (n // 7) % 192) AS BIGINT) AS sum_height,
        |  max(CASE WHEN kind = 'image' THEN 3 ELSE 1 END) AS channels
        |FROM m GROUP BY kind""".stripMargin,

    // the resized container replayed in SQL: original dims from the
    // encode formulas, budget scale m = n·4096/(w·h) (the least() guard
    // mirrors the kernel's upscale cap), target dims from the rewrite.
    "mm_resize_stats" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    length(text) AS n
        |  FROM documents),
        |c AS (SELECT media_id, kind, n,
        |        64 + n % 192 AS w, 64 + (n // 7) % 192 AS h FROM m)
        |SELECT media_id, CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
        |  CAST(CASE WHEN kind = 'image' THEN 3 ELSE 1 END AS INT) AS channels,
        |  CAST(least(n, (n * 4096) // (w * h)) AS BIGINT) AS n_bytes
        |FROM c""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST(ceil(length(text) * 1.0 / 256) AS BIGINT) AS n_frames,
        |  CAST(ceil(ceil(length(text) * 1.0 / 256) / 4.0) AS BIGINT) AS n_sampled
        |FROM documents""".stripMargin,

    // The feature kernel's rolling hash replayed byte-by-byte: a
    // recursive CTE carries h_i = (h_{i-1}*31 + byte_i) mod 2^64 in
    // HUGEINT (== JVM wrapping Long for the ASCII payloads), and each
    // position contributes (h_i mod 65536) to its dim's exact q16 sum.
    "mm_feature_means" ->
      """WITH RECURSIVE hh(doc_id, i, n, h) AS (
        |  SELECT doc_id, 0, length(text), CAST(1125899906842597 AS HUGEINT) FROM documents
        |  UNION ALL
        |  SELECT hh.doc_id, hh.i + 1, hh.n,
        |    (hh.h * 31 + ord(substr(d.text, hh.i + 1, 1))) % CAST('18446744073709551616' AS HUGEINT)
        |  FROM hh JOIN documents d ON hh.doc_id = d.doc_id WHERE hh.i < hh.n),
        |contrib AS (
        |  SELECT CAST((i - 1) % 8 AS INT) AS dim, CAST(h % 65536 AS BIGINT) AS m
        |  FROM hh WHERE i >= 1)
        |SELECT dim,
        |  CAST(CAST(sum(m) AS BIGINT) AS DOUBLE) / (65536 * (SELECT count(*) FROM documents)) AS mean_v,
        |  (SELECT count(*) FROM documents) AS n
        |FROM contrib GROUP BY dim""".stripMargin)
}
