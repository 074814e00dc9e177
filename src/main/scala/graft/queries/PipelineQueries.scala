package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** The whole training-data text pipeline composed as ONE declarative
  * query — normalize → acceptance filter → quality gate → exact dedup
  * (keep-first) → train/test split → per-split stats. Every stage is
  * deterministic, so the end-to-end composition is oracle-checked, not
  * just its pieces.
  *
  * Scale shape: narrow maps + one window over the content-hash
  * partitioning (the dedup) + one final aggregation. The only shuffle
  * of document payloads is the dedup exchange, keyed on an 8-byte
  * content hash.
  */
object PipelineQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    "pipe_text_corpus" -> ((s, d) => {
      val byContent = Window.partitionBy("h").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), normalizeStr(col("text")).as("norm"),
          qualityCounters(col("text")).as("q"))
        // acceptance: normalized content present and long enough
        .where(col("norm").isNotNull && length(col("norm")) >= 50)
        // quality gate: some stopword evidence, sane mean token length
        .where(col("q.n_stop") > 0 && col("q.n_toks") >= 10)
        // exact dedup keep-first on content hash
        .withColumn("h", xxhash64(col("norm")))
        .withColumn("rn", row_number().over(byContent))
        .where(col("rn") === 1)
        // deterministic split + stats
        .withColumn("split",
          when(pmod(col("doc_id"), lit(10)) < 2, "test").otherwise("train"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("q.n_toks")).as("total_tokens"))
    }),

    // Sequence packing (concatenate-and-chunk): docs are laid out in
    // doc_id order within a shard and cut into fixed `SeqLen`-token
    // context windows — the standard packed-pretraining prep, where a
    // doc may straddle a window boundary. Sharding makes the layout
    // embarrassingly parallel: ONE window cumsum per shard, no global
    // sort (a single global ordering would serialize 100 TB through one
    // partition — the shard count is the knob real pipelines use).
    // Output: where each doc lands (start offset + first/last window).
    // RAG-prep chunking: fixed 50-token windows at stride 25 (50%
    // overlap) — the retrieval-corpus shape. Pure map-side: ZERO
    // exchanges (plan-asserted); each chunk leaves the kernel as
    // (doc_id, chunk_id, token count, PolyHash64 fingerprint), never
    // the chunk text — the embedding stage downstream reads chunks
    // by (doc_id, chunk_id), so only ids and stats ever move.
    "pipe_chunk_overlap" -> ((s, d) => {
      val w = 50; val stride = 25
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 1)
        .select(col("doc_id"), posexplode(stridedWindows("t", stride, w)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          size(col("col")).cast("long").as("n_chunk_tokens"),
          graft.functions.PolyHash64Expr(array_join(col("col"), " ")).as("chunk_fp"))
    }),

    "pipe_seq_packing" -> ((s, d) => {
      val w = Window.partitionBy("shard").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), tokenCount(col("text")).as("n_tok"))
        .where(col("n_tok") > 0)
        .withColumn("shard", pmod(col("doc_id"), lit(PackShards)))
        .withColumn("end_tok", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("shard"),
          (col("end_tok") - col("n_tok")).as("start_tok"),
          floor((col("end_tok") - col("n_tok")) / SeqLen.toDouble).cast("long").as("first_window"),
          floor((col("end_tok") - 1) / SeqLen.toDouble).cast("long").as("last_window"))
    }),

    // Deterministic global shuffle — the step that fixes a training
    // order: each doc gets a pseudo-random key from an LCG step
    // (x → (A·x + B) mod P, P = 2^31−1 prime, gcd(A,P)=1 — a BIJECTION
    // on [0,P), so the order is a true permutation, reproducible across
    // runs, engines, and partitionings; no rand()), then lands in a
    // shard (key mod ShuffleShards) at its rank within the shard.
    // Scale shape: ONE exchange on shard + a per-shard sort — never a
    // global sort (a single total order would serialize 100 TB through
    // one partition; the shard count is the knob, 64 here, ~100k at
    // corpus scale). Pure int64 arithmetic (doc_id < P keeps the
    // product under 2^62) replays exactly in DuckDB.
    // Deterministic weighted sampling — the mixing primitive that
    // downsamples a corpus with inclusion probability ∝ a per-doc
    // weight (n_chars as the quality-proxy weight, expected size
    // TargetK): keep iff lcg(doc_id)·ΣW < M·K·w, with the same
    // reproducible LCG priority as pipe_global_shuffle standing in for
    // uniform randomness (no rand() — identical sample across runs,
    // engines, partitionings). ONE aggregate for ΣW crosses in as a
    // 1-row broadcast; the filter is map-side, so the corpus never
    // shuffles. Cross terms widen to DECIMAL(38)/HUGEINT (priority·ΣW
    // wraps int64 on a large corpus). Docs whose weight alone exceeds
    // the quota threshold have inclusion probability ≥ 1 and are
    // always kept — the standard weighted-sampling saturation.
    "pipe_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val tot = docs.agg(sum("n_chars").as("tw"))
      docs.crossJoin(broadcast(tot))
        // multiplier ≈ P/2 (not a small constant like 48271): for
        // small consecutive doc_ids, x·A/P must already wrap the
        // modulus so priorities equidistribute — with a small A every
        // priority in a small-id corpus is near zero and the quota
        // filter degenerates to keep-everything
        .withColumn("pri", lcgHash(col("doc_id")))
        .where(expr(s"CAST(pri AS DECIMAL(38,0)) * tw < CAST($ShufP AS DECIMAL(38,0)) * 100 * n_chars"))
        .select(col("doc_id"), col("n_chars"))
    }),

    "pipe_global_shuffle" -> ((s, d) => {
      val w = Window.partitionBy("shard").orderBy("h", "doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"))
        .withColumn("h", lcgHash(col("doc_id")))
        .withColumn("shard", pmod(col("h"), lit(ShuffleShards)))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // Group-aware (leakage-safe) train/test split: the assignment unit
    // is the SOURCE, not the document — near-duplicates and templated
    // text cluster within a source, so a doc-level hash split leaks
    // them across the boundary (the test set "contains" the training
    // set's templates). Splitting on the source's content hash keeps
    // every doc of a source on one side. PolyHash64 (codegen'd) is the
    // hash because DuckDB replays it exactly in HUGEINT arithmetic —
    // same reason as text_fingerprint. One scan, one tiny aggregate
    // shuffle; the hash is a scalar expression inside codegen.
    "pipe_grouped_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
        .withColumn("split",
          when(pmod(graft.functions.PolyHash64Expr(col("source")), lit(10L)) < 3,
            "test").otherwise("train"))
        .groupBy(col("split"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"))),

    // Distributed tokenizer-training step: corpus-wide adjacent
    // symbol-pair counts over letter runs — the inner loop of BPE
    // training (functions/BpeMerges ran it single-node over the
    // committed corpus; THIS is the shape that trains on 100 TB: one
    // map-side pair explosion, one map-combining aggregate, top-20 via
    // TakeOrdered with a pair tie-break). Iteration 0 shown; later
    // iterations re-run the same plan over the merged symbol table.
    // simple_lower, not builtin lower(): Spark's lower is Java full
    // casing (İ → i+U+0307, so İSTANBUL yields tokens "i","stanbul")
    // while DuckDB's is utf8proc simple (İ → i, one token "istanbul") —
    // the r13 unicode axis caught the split. The codegen'd
    // SimpleLowerExpr pins the per-code-point contract on this side.
    "pipe_bpe_pair_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(regexp_extract_all(
          graft.functions.UnicodeText.simpleLowerCol(col("text")),
          lit("[a-z]+"), lit(0))).as("w"))
        .where(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(20)),

    // Compaction planning — the small-file bin packer every lakehouse
    // maintenance job runs: shard sizes (here per (source, lang), in
    // production a file-manifest listing) ordered largest-first, packed
    // sequentially into ceil(total/6)-byte output bins by START offset
    // (a shard belongs to the bin its cumsum enters). The plan runs on
    // shard METADATA — cardinality = #files, never data rows — so the
    // global sort window is the bounded-entity shape (the vocab-
    // coverage cumsum argument); only the one size aggregate touches
    // the corpus. Output: per-bin shard count and bytes — the work
    // order a rewrite job executes.
    "pipe_compaction_plan" -> ((s, d) => {
      // persist the shard table: it feeds the total AND the packing
      // walk — without the pin the corpus size aggregate would scan
      // the documents table a second time.
      val shards = graft.CacheRegistry.persistTracked(
        Tables.documents(s, d)
          .groupBy("source", "lang")
          .agg(sum(col("n_chars")).as("bytes")))
      val tot = broadcast(shards.agg(sum(col("bytes")).as("total")))
      val w = Window.orderBy(col("bytes").desc, col("source"), col("lang"))
      // greatest(…, 1): a degenerate zero-byte corpus would otherwise
      // divide by zero — Spark's non-ANSI div yields NULL bins while
      // DuckDB raises, so the engines would fail DIFFERENTLY. The
      // guard (mirrored in the oracle) makes both emit bin 0.
      shards.crossJoin(tot)
        .withColumn("target", greatest(expr("(total + 5) div 6"), lit(1L)))
        .withColumn("cum", sum(col("bytes")).over(w))
        .withColumn("bin", expr("(cum - bytes) div target"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_shards"), sum(col("bytes")).as("bin_bytes"))
    }),

    // Domain-mixture re-weighting — the data-mixing pass a training
    // corpus gets before anything else: head domains are √-suppressed
    // (keep rate min(1, √(pivot/n_s)), so a domain's sampled share
    // grows like √n_s instead of n_s — the WebText/CC-mix shape),
    // tail domains (n_s ≤ pivot) keep everything. Selection is the
    // repo's deterministic LCG on doc_id (pipe_global_shuffle's
    // constants — no rand(), replayable in integer SQL), compared
    // against a per-domain integer threshold floor(rate·1e6): one
    // float op chain (divide, sqrt, multiply, floor) identical on both
    // engines, everything after it pure integers. Per-domain rates
    // depend only on that domain's count — deliberately NO
    // normalizing Σ over domains, which would put a cross-engine
    // float SUM (partition-order-sensitive) into the rate. Shape: one
    // tiny source-cardinality aggregate (persisted: it feeds the
    // thresholds AND the final report), broadcast back over one scan,
    // one map-combining count — two corpus-width passes, no wide
    // shuffle, linear to any corpus size.
    "pipe_domain_mixture" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = graft.CacheRegistry.persistTracked(
        docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .withColumn("rate",
            least(lit(1.0), sqrt(lit(MixPivot) / col("n_docs"))))
          .withColumn("thr",
            floor(col("rate") * 1000000.0).cast("long")))
      val sampled = docs.select(col("doc_id"), col("source"))
        .withColumn("h", lcgHash(col("doc_id")))
        .join(broadcast(rates.select(col("source"), col("thr"))), Seq("source"))
        .groupBy("source")
        .agg(sum(when(col("h") % 1000000L < col("thr"), 1L).otherwise(0L))
          .as("n_sampled"))
      rates.join(sampled, Seq("source"))
        .select(col("source"), col("n_docs"),
          round(col("rate"), 6).as("rate"), col("n_sampled"),
          round(col("n_sampled").cast("double") / col("n_docs"), 6)
            .as("eff_rate"))
    }))

  /** pipe_domain_mixture's suppression pivot: domains with ≤ this many
    * docs keep everything; larger domains keep √(pivot/n). ONE constant
    * feeding the Spark expression and the oracle (Bm25 discipline). */
  private val MixPivot = 64.0

  private val SeqLen = 2048
  private val PackShards = 32
  private val ShufP = 2147483647L // 2^31 − 1 (Mersenne prime)
  private val ShufA = 1103515245L
  private val ShufB = 12345L
  private val ShuffleShards = 64L

  /** The repo's deterministic selection hash, ((id mod P)·A + B) mod P
    * — ONE definition for every site that uses "pipe_global_shuffle's
    * constants" (global shuffle, weighted sampling, domain mixture),
    * so the formula cannot drift per site (r13 review: two hand-copied
    * instances had already diverged pmod-vs-% — identical on the
    * schema's non-negative ids, but a silent fork). pmod first, so a
    * hypothetical negative id still yields a non-negative hash; the
    * outer plain % is exact because the operand is already ≥ 0. */
  private def lcgHash(id: Column): Column =
    (pmod(id, lit(ShufP)) * ShufA + ShufB) % ShufP

  override def oracles: Map[String, String] = Map(
    "pipe_compaction_plan" ->
      """WITH shards AS (
        |  SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS total FROM shards),
        |c AS (
        |  SELECT bytes,
        |    CAST(sum(bytes) OVER (ORDER BY bytes DESC, source, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    greatest((total + 5) // 6, 1) AS target
        |  FROM shards, tot)
        |SELECT (cum - bytes) // target AS bin, count(*) AS n_shards,
        |  CAST(sum(bytes) AS BIGINT) AS bin_bytes
        |FROM c GROUP BY 1""".stripMargin,

    "pipe_bpe_pair_counts" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
        |  FROM w WHERE length(w) >= 2)
        |SELECT pair, count(*) AS cnt FROM p
        |GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "pipe_grouped_split" ->
      """WITH hashed AS (
        |  SELECT doc_id, source,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(1, length(source) + 1), i -> CAST(ord(substr(source, i, 1)) AS HUGEINT))),
        |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS h,
        |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS n_tok
        |  FROM documents),
        |signed AS (
        |  SELECT source, n_tok,
        |    CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
        |      THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS hs
        |  FROM hashed),
        |sp AS (
        |  SELECT source, n_tok,
        |    CASE WHEN ((hs % 10) + 10) % 10 < 3 THEN 'test' ELSE 'train' END AS split
        |  FROM signed)
        |SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
        |FROM sp GROUP BY 1""".stripMargin,

    // same float op chain as the Spark side (divide, sqrt, ×1e6,
    // floor), then pure integers: the LCG select and both counts
    // replay exactly; round(…, 6) on the two report doubles.
    "pipe_domain_mixture" ->
      s"""WITH per AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |r AS (
         |  SELECT source, n_docs,
         |    least(1.0, sqrt($MixPivot / n_docs)) AS rate,
         |    CAST(floor(least(1.0, sqrt($MixPivot / n_docs)) * 1000000) AS BIGINT) AS thr
         |  FROM per),
         |sel AS (
         |  SELECT d.source,
         |    CASE WHEN (((d.doc_id % $ShufP) * $ShufA + $ShufB) % $ShufP) % 1000000 < r.thr
         |      THEN 1 ELSE 0 END AS s
         |  FROM documents d JOIN r ON d.source = r.source),
         |agg AS (SELECT source, CAST(sum(s) AS BIGINT) AS n_sampled FROM sel GROUP BY 1)
         |SELECT r.source, r.n_docs, round(r.rate, 6) AS rate, agg.n_sampled,
         |  round(agg.n_sampled * 1.0 / r.n_docs, 6) AS eff_rate
         |FROM r JOIN agg ON r.source = agg.source""".stripMargin,

    // LCG constants interpolated from the SAME ShufP/ShufA/ShufB the
    // Spark lcgHash uses (r13 ADVICE: this was the one remaining
    // hand-copied instance of the formula — a constant change could
    // fork the engines silently)
    "pipe_weighted_sample" ->
      s"""WITH tot AS (SELECT sum(n_chars) AS tw FROM documents)
        |SELECT doc_id, n_chars
        |FROM documents, tot
        |WHERE CAST(((doc_id % $ShufP) * $ShufA + $ShufB) % $ShufP AS HUGEINT) * tw
        |    < CAST($ShufP AS HUGEINT) * 100 * n_chars""".stripMargin,

    "pipe_global_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ((doc_id % $ShufP) * $ShufA + $ShufB) % $ShufP AS h
         |  FROM documents),
         |s AS (SELECT doc_id, h, h % $ShuffleShards AS shard FROM h)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
         |FROM s""".stripMargin,

    "pipe_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(range((len(t)+24)//25)) AS chunk_id,
        |    unnest(list_transform(range((len(t)+24)//25),
        |      i -> CAST(len(t[(i*25+1):(i*25+50)]) AS BIGINT))) AS n_chunk_tokens,
        |    unnest(list_transform(range((len(t)+24)//25),
        |      i -> array_to_string(t[(i*25+1):(i*25+50)], ' '))) AS chunk
        |  FROM toks WHERE len(t) >= 1),
        |hashed AS (
        |  SELECT doc_id, chunk_id, n_chunk_tokens,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(1, length(chunk) + 1), i -> CAST(ord(substr(chunk, i, 1)) AS HUGEINT))),
        |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS h
        |  FROM ch)
        |SELECT doc_id, chunk_id, n_chunk_tokens,
        |  CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
        |    THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS chunk_fp
        |FROM hashed""".stripMargin,

    "pipe_seq_packing" ->
s"""WITH t AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tok,
         |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS end_tok
         |  FROM t WHERE n_tok > 0)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  CAST(end_tok - n_tok AS BIGINT) AS start_tok,
         |  CAST((end_tok - n_tok) // $SeqLen AS BIGINT) AS first_window,
         |  CAST((end_tok - 1) // $SeqLen AS BIGINT) AS last_window
         |FROM c""".stripMargin,

    "pipe_text_corpus" ->
      """WITH prep AS (
        |  SELECT doc_id, lang,
        |    nullif(lower(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'), '^\s+|\s+$', '', 'g')), '') AS norm,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang, norm, len(toks) AS n_toks,
        |    len(list_filter(toks, x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be','this'))) AS n_stop
        |  FROM prep
        |  WHERE norm IS NOT NULL AND length(norm) >= 50),
        |gated AS (
        |  SELECT *, row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
        |  FROM scored WHERE n_stop > 0 AND n_toks >= 10)
        |SELECT CASE WHEN doc_id % 10 < 2 THEN 'test' ELSE 'train' END AS split,
        |  lang, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS total_tokens
        |FROM gated WHERE rn = 1
        |GROUP BY 1, 2""".stripMargin)
}
