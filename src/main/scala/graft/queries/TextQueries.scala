package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis query surface over the `documents` table.
  *
  * Covers the reference's scan→project→explode→filter→aggregate layer
  * (SURVEY.md §2.2 P3-P6, §2.3 A1-A2 — keyword/fos counting reshaped onto
  * document tokens) and the training-data text ops (token stats, quality,
  * language id, fingerprints).
  *
  * Scale notes: every query here is a narrow map over the scan followed by
  * at most one hash aggregation on a bounded-cardinality key (tokens,
  * langs) — map-side partial aggregation keeps the shuffle tiny relative
  * to input, so these scale linearly to 100 TB.
  */
object TextQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // A1/P6 analogue: explode tokens, group-count.
    "text_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))),

    // P3/P5 analogue: normalize + acceptance filter (lang whitelist,
    // min length), count survivors per (lang, source).
    "text_normalize_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("source"), normalizeStr(col("text")).as("norm"))
        .where(col("lang").isin("en", "de") && col("norm").isNotNull &&
          length(col("norm")) >= 50)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("cnt"), sum(length(col("norm"))).as("total_len"))),

    // Token statistics per document (whitespace + subword counts).
    "text_token_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          subwordCount(col("text")).as("n_subwords"),
          length(col("text")).as("n_chars_computed"))),

    // Quality scoring: deterministic heuristic per document. Counters
    // come from one UDF pass; the ratio arithmetic (int-derived double
    // division + round) runs in SQL, identical to the pure-column
    // formulation and to the DuckDB oracle.
    "text_quality" -> ((s, d) =>
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), qualityCounters(col("text")).as("q"))
        .select(
          col("doc_id"),
          round(when(col("q.n_chars") === 0, 0.0)
            .otherwise((col("q.n_chars") - col("q.n_kept")).cast("double") /
              col("q.n_chars")), 6).as("punct_ratio"),
          round(when(col("q.n_toks") === 0, 0.0)
            .otherwise(col("q.n_stop").cast("double") / col("q.n_toks")), 6)
            .as("stopword_ratio"),
          round(when(col("q.n_toks") === 0, 0.0)
            .otherwise(col("q.sum_tok_len").cast("double") / col("q.n_toks")), 6)
            .as("mean_token_len"))),

    // Rolling-hash fingerprint per document (order-sensitive content id).
    "text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))),

    // Within-doc repetition ratio (templated-text detector).
    "text_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), round(repetitionRatio(col("text")), 6).as("rep_ratio"))),

    // Language-id heuristic vs the labeled lang column: confusion counts.
    "text_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), langId(col("text")).as("pred"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("cnt"))),

    // Bigram-coverage quality score — a deterministic stand-in for the
    // LM-perplexity filter real curation pipelines run: the share of a
    // document's distinct word bigrams that are corpus-common
    // (document frequency ≥ max(3, n_docs/20); the threshold scales
    // with the corpus so the score discriminates at every SF). Pure
    // integer counting + ONE final double division, so it replays
    // exactly in DuckDB — unlike a float LM score. Shape: single scan,
    // bigram df via a count window over the bigram hash partitioning
    // (no self-join, no second scan), then one doc_id aggregation —
    // two shuffles total, both map-combinable at the second stage.
    "text_bigram_coverage" -> ((s, d) => {
      val kRow = broadcast(Tables.documents(s, d)
        .agg(count(lit(1)).as("n_docs"))
        .select(greatest(lit(3L), expr("n_docs div 20")).as("k")))
      val docBg = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(array_distinct(
          expr("transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))).as("b"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("b")
      docBg.withColumn("df", count(lit(1)).over(w))
        .crossJoin(kRow)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("df") >= col("k"), 1L).otherwise(0L)).as("n_common"))
        .select(col("doc_id"), col("n_bigrams"), col("n_common"),
          (col("n_common").cast("double") / col("n_bigrams")).as("coverage"))
    }))

  private val bigramCoverageOracle =
    """WITH k AS (
      |  SELECT greatest(3, count(*) // 20) AS k FROM documents),
      |toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS t
      |  FROM documents),
      |bg AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
      |  FROM toks WHERE len(t) >= 2),
      |wd AS (SELECT doc_id, count(*) OVER (PARTITION BY b) AS df FROM bg)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(CASE WHEN df >= k THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |  CAST(sum(CASE WHEN df >= k THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS coverage
      |FROM wd, k GROUP BY 1""".stripMargin

  private val oraclesBase: Map[String, String] = Map(
    "text_bigram_coverage" -> bigramCoverageOracle,
    "text_token_count" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |      FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token""".stripMargin,

    "text_normalize_filter" ->
      """WITH n AS (
        |  SELECT lang, source,
        |         nullif(lower(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'), '^\s+|\s+$', '', 'g')), '') AS norm
        |  FROM documents)
        |SELECT lang, source, count(*) AS cnt, CAST(sum(length(norm)) AS BIGINT) AS total_len
        |FROM n
        |WHERE lang IN ('en','de') AND norm IS NOT NULL AND length(norm) >= 50
        |GROUP BY lang, source""".stripMargin,

    "text_token_stats" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0)) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+'))
        |    + len(regexp_extract_all(text, '[0-9]+'))
        |    + length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_subwords,
        |  length(text) AS n_chars_computed
        |FROM documents""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  round(CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |         / length(text) END, 6) AS punct_ratio,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0
        |    ELSE len(list_filter(toks, x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'))) * 1.0
        |         / len(toks) END, 6) AS stopword_ratio,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0
        |    ELSE list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) END, 6)
        |    AS mean_token_len
        |FROM t""".stripMargin)
  private val repetitionOracle =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  round(CASE WHEN len(toks) = 0 THEN 0.0
      |    ELSE 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) END, 6) AS rep_ratio
      |FROM t""".stripMargin

  /** Marker-count argmax as plain SQL. Tie-break order mirrors Spark's
    * array_max over (score, lang) structs: highest score, then the
    * lexicographically largest language code (zh > fr > es > en > de). */
  private val langidOracle =
    """WITH t AS (
      |  SELECT lang, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS toks
      |  FROM documents),
      |s AS (
      |  SELECT lang,
      |    len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
      |    len(list_filter(toks, x -> x IN ('the','and','of','is','to'))) AS s_en,
      |    len(list_filter(toks, x -> x IN ('el','la','de','que','los'))) AS s_es,
      |    len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS s_fr,
      |    len(list_filter(toks, x -> x IN ('de5','shi4','le5','zai4','he2'))) AS s_zh
      |  FROM t)
      |SELECT lang, pred, count(*) AS cnt FROM (
      |  SELECT lang,
      |    CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
      |         WHEN s_zh = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
      |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
      |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
      |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
      |         ELSE 'de' END AS pred
      |  FROM s) GROUP BY 1, 2""".stripMargin

  /** The poly-31 rolling hash in 128-bit arithmetic: HUGEINT mod 2^64
    * reproduces the JVM's wrapping Long exactly (ASCII corpus, so char
    * codes == code points == bytes); the final CASE folds the unsigned
    * residue back to the signed BIGINT Spark emits. */
  private val fingerprintOracle =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS ts
      |  FROM documents),
      |joined AS (SELECT doc_id, array_to_string(ts, chr(1)) AS s FROM toks),
      |hashed AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(1125899906842597 AS HUGEINT),
      |        list_transform(range(1, length(s) + 1), i -> CAST(ord(substr(s, i, 1)) AS HUGEINT))),
      |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS h
      |  FROM joined),
      |signed AS (
      |  SELECT doc_id, CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
      |    THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS fp
      |  FROM hashed)
      |SELECT fp, count(*) AS n_docs, min(doc_id) AS min_doc
      |FROM signed GROUP BY fp""".stripMargin

  override def oracles: Map[String, String] =
    oraclesBase + ("text_repetition" -> repetitionOracle) +
      ("text_langid" -> langidOracle) +
      ("text_fingerprint" -> fingerprintOracle)
}
