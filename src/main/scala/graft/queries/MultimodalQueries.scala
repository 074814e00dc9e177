package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Driver surface for the multimodal layer: payloads manufactured from
  * `documents` (UTF-8 bytes), decode/frame-sample stubs arithmetic-in-
  * length so DuckDB can oracle the full binary-column pipeline. */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // decode stub over binary payloads → per-kind shape stats.
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

    // rolling-hash feature stub → per-dimension corpus means
    // (hash-derived → rows-only check; pins the feature plumbing).
    "mm_feature_means" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
      Multimodal.features(media, dim = 8)
        .select(posexplode(col("feature")).as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(round(avg("v"), 4).as("mean_v"), count(lit(1)).as("n"))
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

    "mm_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST(ceil(length(text) * 1.0 / 256) AS BIGINT) AS n_frames,
        |  CAST(ceil(ceil(length(text) * 1.0 / 256) / 4.0) AS BIGINT) AS n_sampled
        |FROM documents""".stripMargin)
}
