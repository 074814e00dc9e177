package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Training-data curation operators the reference never needed but a
  * 100 TB pretraining pipeline runs daily: benchmark decontamination,
  * staged quality-funnel observability, domain-mix accounting,
  * TF-IDF-style distinctive terms, and an ordered event funnel.
  *
  * Scale shapes:
  *  - Decontamination broadcasts the EVAL n-gram set (benchmarks are
  *    MBs even when the corpus is 100 TB) so the train scan never
  *    shuffles; only matched grams (tiny) are exchanged. The broadcast
  *    is count-gated (evalBroadcastGate): an eval side that turns out
  *    corpus-sized routes to a shuffle join instead of a forced
  *    unbounded broadcast.
  *  - The funnel and mix queries are single-pass conditional aggregates
  *    — one exchange of a handful of counters.
  *  - TF-IDF is two aggregations and a per-doc top-k window; the
  *    document-frequency side is vocabulary-sized, so AQE broadcasts it
  *    back onto the term-frequency side.
  *  - The event funnel reuses one user_id hash partitioning across its
  *    three stage aggregations.
  */
object CurationQueries extends QueryPack {

  /** Decontamination n-gram width. Real pipelines use 8–13; 5 keeps the
    * synthetic corpus's overlap observable while exercising the same
    * plumbing. */
  private val N = 5

  /** PII patterns, engine-portable by construction (character classes
    * + bounded/simple quantifiers only — no lookaround, no \b). */
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiPhone = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
  private[graft] val PiiIp = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[graft] val PiiLongNum = "[0-9]{6,}"

  /** Every doc's distinct word-5-grams as STRINGS (the shared
    * [[graft.functions.TextFunctions.wordNgrams]] kernel — the streaming
    * ingest guard uses the same one, so batch and stream agree on what
    * "contaminated" means). Joining on the raw gram keeps the result
    * exactly equal to the oracle; at 100 TB you would join on
    * xxhash64(gram) instead and accept a 2^-64 per-gram false-positive —
    * the plan shape is identical, only the key width changes. */
  private def docGrams(s: org.apache.spark.sql.SparkSession, d: String) =
    // ONE-PASS kernel, not tokens() + wordNgrams(): the r12 giant-doc
    // probe caught the optimizer pushing an explode-inferred filter
    // below the token-materializing Project and substituting the
    // tokenizer back into the gram lambda — the pushed predicate then
    // re-split the document once PER GRAM, O(tokens²) per row (a
    // 2M-token doc ground one task >15 min; see wordNgrams' scale
    // warning). wordGramsDistinct is a self-contained O(tokens) UDF,
    // so every planner copy of it stays linear. Empty-gs docs (under
    // N tokens) filter out exactly as the old size(ts) >= N did.
    Tables.documents(s, d)
      .select(col("doc_id"), wordGramsDistinct(col("text"), N).as("gs"))
      .where(size(col("gs")) > 0)

  /** Ubiquity guard for the leakage matrix: a gram present in more
    * than this many sources is boilerplate, not leakage signal — and
    * contributes df² matrix pairs (the wedge-hub failure mode).
    * Observed max source-df is 3–4 at graded SFs, so the cap is
    * invisible there; interpolated into the oracle so both engines
    * apply the identical guard (the blockCap discipline). */
  private val LeakDfCap = 32

  /** Containment threshold for the fuzzy decontamination pass: a train
    * doc containing ≥ half of an eval doc's distinct shingles is a
    * near-copy. The observed corpus distribution cliffs hard (every
    * honest pair sits below 0.34 at both graded SFs; planted/straddling
    * near-dups sit above 0.95), so the grade is insensitive to the
    * exact cut. */
  private[graft] val FuzzyThreshold = 0.5

  /** Eval-side shingle df cap for pipe_decontaminate_fuzzy — the
    * LeakDfCap discipline on the benchmark side: a shingle in more
    * than this many EVAL docs is boilerplate and fans out train_df×df
    * candidate hits. Max observed eval-df at graded SFs is single
    * digits, so the cap is invisible there; the planted correlated
    * fixture in CurationSpec is where it binds.
    * `SPARK_GRAFT_FUZZY_EVAL_DF_CAP` overrides (0 disables — soak A/B
    * arm). */
  private[graft] def fuzzyEvalDfCap: Long =
    sys.env.get("SPARK_GRAFT_FUZZY_EVAL_DF_CAP").map(_.toLong).getOrElse(64L)

  /** Broadcast gate (rows) for the decontamination passes' eval-side
    * index. The eval corpus is benchmark-sized by contract — MBs
    * against a 100 TB train corpus — so the broadcast hint is the
    * right default; but `broadcast()` FORCES the exchange regardless
    * of size, and this harness's stand-in eval slice (doc_id % 50) is
    * 2% of the corpus, i.e. it grows with N. Past the gate the hint is
    * dropped and the join routes through the planner's own size logic
    * (a shuffle join on the 8-byte key at real scale) — identical
    * rows, bounded driver/executor memory. Same discipline and same 5M
    * figure as [[graft.streaming.StreamingGuards.evalGramIndex]]'s
    * exact-set→Bloom route; counted BEFORE any broadcast is built.
    * `SPARK_GRAFT_EVAL_BROADCAST_GATE` overrides (0 disables — the
    * always-broadcast arm of the soak A/B). */
  private[graft] def evalBroadcastGate: Long =
    sys.env.get("SPARK_GRAFT_EVAL_BROADCAST_GATE").map(_.toLong).getOrElse(5000000L)

  /** Decision cache for [[gateBroadcastable]], keyed by (session
    * identity, analyzed-plan semantic hash, gate) — r11 ADVICE: the
    * gate count is an eager job during query CONSTRUCTION, so without
    * the cache every build of pipe_decontaminate_report re-ran three
    * corpus scans and even plan-only consumers (ExplainProbe,
    * PlanInvariantsSpec) paid real scans to print a plan. Now a given
    * eval relation is counted once per session; every later build of
    * any pass sharing it (the report composes three) reuses the
    * decision. Lifetime = session: source data is immutable under a
    * benchmark dir, and even a stale entry only flips broadcast vs
    * shuffle ROUTING — the two routes are row-identical by the gate's
    * own spec, so correctness never depends on cache freshness. Keyed
    * by the SESSION OBJECT in a WeakHashMap (not identityHashCode,
    * which is reused after GC and let a later session inherit a dead
    * session's decisions — r12 ADVICE): decisions die with their
    * session, and per-session keys are O(#distinct eval relations) —
    * no other eviction needed. */
  private val gateDecisions =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[(Int, Long), java.lang.Boolean]]()

  /** One gate decision (count ≤ gate, 0 disables) shared by every
    * decontamination pass — single-sourced so the gate semantics can
    * never diverge between the three routings. The count runs BEFORE
    * any broadcast is built; pin the relation first when it feeds
    * multiple consumers. */
  private[graft] def gateBroadcastable(df: org.apache.spark.sql.DataFrame, gate: Long): Boolean =
    gate <= 0 || {
      val perSession = gateDecisions.synchronized {
        var m = gateDecisions.get(df.sparkSession)
        if (m == null) {
          m = new java.util.concurrent.ConcurrentHashMap[(Int, Long), java.lang.Boolean]()
          gateDecisions.put(df.sparkSession, m)
        }
        m
      }
      perSession.computeIfAbsent(
        (df.queryExecution.analyzed.semanticHash(), gate),
        _ => df.count() <= gate)
    }

  /** Apply (or drop) the broadcast hint per the shared gate decision. */
  private[graft] def routeIf(broadcastable: Boolean)(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (broadcastable) broadcast(df) else df

  /** Cap-injectable core of pipe_decontaminate_fuzzy — spec'd directly
    * (env is immutable in a test JVM, so CurationSpec passes the cap
    * explicitly; the DedupQualitySpec discipline). */
  private[graft] def decontaminateFuzzyCap(
      s: org.apache.spark.sql.SparkSession, d: String, cap: Long,
      gate: Long = evalBroadcastGate): org.apache.spark.sql.DataFrame = {
    val isEval = pmod(col("doc_id"), lit(50)) === 0
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.HashFunctions.wordShingleHashes(col("text"), 3).as("hs"))
      .where(size(col("hs")) > 0)
    val evalEx = sh.where(isEval)
      .select(col("doc_id").as("eval_id"), explode(col("hs")).as("h"))
    // pinned: the index feeds the sizes aggregate AND the train join
    // (without the pin each consumer re-explodes the eval slice), and
    // the broadcast gate needs its row count before any exchange
    val evalIdx = graft.CacheRegistry.persistTracked(
      if (cap <= 0) evalEx
      else evalEx.join(
        evalEx.groupBy("h").agg(count(lit(1)).as("edf"))
          .where(col("edf") <= cap).select("h"),
        Seq("h"), "left_semi"))
    // one gate decision covers both eval-side relations (sizes has at
    // most one row per eval doc — strictly fewer than the index)
    val route = routeIf(gateBroadcastable(evalIdx, gate)) _
    val evalSizes = evalIdx.groupBy("eval_id").agg(count(lit(1)).as("n_eval"))
    val hits = sh.where(!isEval)
      .select(col("doc_id").as("train_id"), explode(col("hs")).as("h"))
      .join(route(evalIdx.toDF()), Seq("h"))
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("c"))
    hits.join(route(evalSizes), Seq("eval_id"))
      .select(col("eval_id"), col("train_id"), col("n_eval"), col("c"),
        round(col("c").cast("double") / col("n_eval"), 6).as("containment"))
      .where(col("containment") >= FuzzyThreshold)
  }

  /** Gate-injectable core of pipe_decontaminate (see
    * [[evalBroadcastGate]]; CurationSpec drives the shuffle arm with an
    * explicit gate since env is immutable inside a test JVM). */
  private[graft] def decontaminateGate(
      s: org.apache.spark.sql.SparkSession, d: String,
      gate: Long = evalBroadcastGate): org.apache.spark.sql.DataFrame = {
    val grams = docGrams(s, d)
    val isEval = pmod(col("doc_id"), lit(50)) === 0
    val evalEx = grams.where(isEval)
      .select(col("doc_id"), explode(col("gs")).as("s"))
    // pinned so the gate's count and the semi-join share one
    // materialization of the distinct eval grams
    val evalSet = graft.CacheRegistry.persistTracked(evalEx.select("s").distinct())
    val route = routeIf(gateBroadcastable(evalSet, gate))(evalSet.toDF())
    // map-side semi-join against the (gated) eval set, then dedup the
    // (few) matched grams
    val found = grams.where(!isEval)
      .select(explode(col("gs")).as("s"))
      .join(route, Seq("s"), "left_semi")
      .distinct()
    val hits = evalEx.join(found, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    grams.where(isEval)
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          col("n_grams"), 6).as("contamination"))
  }

  override def queries: Map[String, Q] = Map(
    // Cross-source leakage matrix — which corpus sources share verbatim
    // 5-grams (the duplicated-fixture docs light this up): the
    // before-training audit that tells you WHERE contamination comes
    // from, complementing pipe_decontaminate's per-document view.
    // Shape: grams hash to 8 bytes map-side (PolyHash64 — gram text
    // never shuffles), dedupe to (source, h), source-df decorates back
    // (2 ≤ df ≤ LeakDfCap — singletons can't pair, ubiquitous grams are
    // capped boilerplate), then the pair expansion is the df-bounded
    // wedge join. Top-20 source pairs by shared-gram count,
    // deterministic full-tuple tie-break.
    "pipe_leakage_matrix" -> ((s, d) => {
      val sg = graft.CacheRegistry.persistTracked(
        Tables.documents(s, d)
          // one-pass gram kernel (the docGrams O(tokens²)-pushdown fix)
          .select(col("source"), explode(wordGramsDistinct(col("text"), N)).as("g"))
          .select(col("source"), graft.functions.PolyHash64Expr(col("g")).as("h"))
          .distinct())
      val ok = sg.join(
          sg.groupBy("h").agg(count(lit(1)).as("sdf"))
            .where(col("sdf") >= 2 && col("sdf") <= LeakDfCap),
          Seq("h"))
        .select("source", "h")
      ok.as("a")
        .join(ok.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
        .orderBy(col("shared_grams").desc, col("source_a"), col("source_b"))
        .limit(20)
    }),

    // Benchmark decontamination: which held-out (eval) documents share
    // 5-grams with the training corpus, and how badly. Eval slice =
    // doc_id % 50 == 0 (stands in for a benchmark set). The eval gram
    // set is broadcast while it is benchmark-sized (count-gated — see
    // evalBroadcastGate; past the gate the planner's shuffle join takes
    // over with identical rows); the train side is scanned, filtered
    // map-side, and only MATCHED grams are deduplicated through an
    // exchange.
    "pipe_decontaminate" -> ((s, d) => decontaminateGate(s, d)),

    // The trilogy's operational artifact: ONE row per eval doc with all
    // three decontamination signals and the keep/drop verdict a
    // curation run actually consumes — exact 5-gram contamination
    // ratio, max fuzzy shingle containment (≥ 0.5 pairs, else 0), max
    // semantic cosine (≥ 0.4 pairs, else 0), flagged = any signal
    // fired. The SPINE is the documents table's eval slice itself, so
    // the row universe is literally EVERY eval doc: a 3-4-token doc
    // has no 5-grams for the exact pass to audit (ratio reports 0)
    // but its SHINGLE or EMBEDDING signal can still fire — basing the
    // spine on any single pass would report such a doc clean by
    // omission. The exact flag derives from the contaminated-gram
    // COUNT, not the 6-dp rounded ratio (one verbatim hit in a ~2M-
    // gram doc rounds to 0.000000 but must still flag). The semantic
    // column joins on the synthetic corpus's doc_id = vec_id
    // correspondence; eval docs without an embedding row report 0
    // there. Each underlying pass keeps its own 100 TB shape (gated
    // eval broadcasts, bucket equi-join) — the report adds only
    // eval-cardinality aggregations and eval-keyed joins on top.
    "pipe_decontaminate_report" -> ((s, d) => {
      val spine = Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id").as("eval_id"))
      val ex = decontaminateGate(s, d)
        .select(col("doc_id").as("eval_id"), col("contamination"), col("n_contaminated"))
      val fz = decontaminateFuzzyCap(s, d, fuzzyEvalDfCap)
        .groupBy("eval_id").agg(max(col("containment")).as("fmax"))
      val sm = graft.queries.DedupQueries.decontaminateSemanticGate(s, d)
        .groupBy("eval_id").agg(max(col("sim")).as("smax"))
      spine.join(ex, Seq("eval_id"), "left")
        .join(fz, Seq("eval_id"), "left")
        .join(sm, Seq("eval_id"), "left")
        .select(col("eval_id"),
          coalesce(col("contamination"), lit(0.0)).as("exact_contamination"),
          coalesce(col("fmax"), lit(0.0)).as("fuzzy_max_containment"),
          coalesce(col("smax"), lit(0.0)).as("semantic_max_sim"),
          (coalesce(col("n_contaminated"), lit(0L)) > 0 ||
            col("fmax").isNotNull || col("smax").isNotNull).cast("long").as("flagged"))
    }),

    // FUZZY benchmark decontamination — the near-duplicate companion to
    // pipe_decontaminate's exact-gram view: an eval doc is contaminated
    // when some TRAIN doc contains most of its shingles even if no
    // single 5-gram survives verbatim edits (the paraphrased-benchmark
    // case exact matching misses; real pipelines run both passes).
    // Metric: containment of the eval doc in the train doc — shared
    // distinct word-3-gram shingles over the eval doc's shingle count
    // (Jaccard would dilute a benchmark question embedded in a long
    // train doc to ~0; containment is the right directional measure).
    // Shape: the eval side is benchmark-sized however big the corpus,
    // so its (hash, eval_id) index BROADCASTS and the train scan never
    // shuffles (count-gated like the exact pass — evalBroadcastGate —
    // so a misconfigured corpus-scale "eval" slice degrades to a
    // shuffle join instead of an unbounded forced broadcast)
    // — shingles hash to 8 bytes map-side (wordShingleHashes),
    // the broadcast join emits only matched (train, eval) hits, and the
    // one exchange aggregates those hits at matched-pair cardinality.
    // Guard: shingles present in more than FuzzyEvalDfCap EVAL docs are
    // boilerplate, not contamination signal, and each contributes
    // train_df × eval_df candidate hits — they leave the shingle
    // UNIVERSE (both c and n_eval, cap interpolated into the oracle so
    // both engines agree; invisible at driver SFs where max eval-df is
    // far below the cap, binding only on the planted spec fixture).
    "pipe_decontaminate_fuzzy" -> ((s, d) =>
      decontaminateFuzzyCap(s, d, fuzzyEvalDfCap)),

    // Quality-funnel observability: how many docs survive each curation
    // stage, cumulatively. ONE pass of conditional sums — the funnel is
    // a single row of counters however large the corpus — then a tiny
    // unpivot for presentation.
    // PII scan + redaction — the privacy pass a corpus runs before
    // release: count email / phone / IPv4 / long-digit-run matches per
    // document and measure the redacted length after masking. The
    // patterns use only character classes and bounded-or-simple
    // quantifiers, so Java (Spark) and RE2-ish (DuckDB) engines match
    // identically; counts come off the ORIGINAL text, and the mask
    // chain applies email → phone → IP in a fixed order so overlaps
    // resolve identically on both engines. At 100 TB this is one
    // map-side codegen'd pass — the scan never shuffles; PIISpec pins
    // the match/redaction behavior on a planted-PII fixture.
    "text_pii_scan" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(PiiEmail), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PiiPhone), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("text"), lit(PiiIp), lit(0))).as("n_ips"),
        size(regexp_extract_all(col("text"), lit(PiiLongNum), lit(0))).as("n_longnums"),
        length(regexp_replace(regexp_replace(regexp_replace(col("text"),
          PiiEmail, "<EMAIL>"), PiiPhone, "<PHONE>"), PiiIp, "<IP>"))
          .as("redacted_len"))),

    // k-anonymity audit — PII's structured-data companion: bucket every
    // customer by quasi-identifier tuple (nation, segment, $1000
    // account-balance band) and report the equivalence-class size
    // census with an at-risk flag for classes below k=5 (those rows
    // are re-identifiable and a release pipeline must suppress or
    // generalize them). Two cascaded aggregations, both map-combining;
    // output is bounded by the distinct class-size count — at 100 TB
    // this is a scan plus two tiny shuffles. The band uses floor() of
    // a double division, identical IEEE semantics on both engines.
    "q_k_anonymity" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / lit(1000.0)).as("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("gsz"))
        .groupBy("gsz")
        .agg(count(lit(1)).as("n_groups"), sum(col("gsz")).as("n_customers"))
        .select(col("gsz").as("group_size"), col("n_groups"), col("n_customers"),
          when(col("gsz") < 5, lit(1L)).otherwise(lit(0L)).as("at_risk"))),

    "pipe_quality_funnel" -> ((s, d) => {
      val q = Tables.documents(s, d)
        .select(col("lang"), col("n_chars"), qualityCounters(col("text")).as("q"))
      val en = col("lang") === "en"
      val chars = en && col("n_chars") >= 100L
      val toks = chars && col("q.n_toks") >= 30
      val stop = toks && col("q.n_stop") > 0
      // coalesce + zero-guard (r13 empty axis): empty-corpus sums are
      // NULL and the retention ratio was an ANSI divide-by-zero — the
      // funnel's contract is five stage rows of zeros, retention 0.0
      q.agg(
          count(lit(1)).as("s0"),
          coalesce(sum(en.cast("long")), lit(0L)).as("s1"),
          coalesce(sum(chars.cast("long")), lit(0L)).as("s2"),
          coalesce(sum(toks.cast("long")), lit(0L)).as("s3"),
          coalesce(sum(stop.cast("long")), lit(0L)).as("s4"))
        .select(expr(
          "stack(5, 0, 'all', s0, 1, 'lang_en', s1, 2, 'min_chars', s2, " +
            "3, 'min_toks', s3, 4, 'has_stopwords', s4) AS (stage_idx, stage, n_docs)"))
        .select(col("stage_idx").cast("long").as("stage_idx"), col("stage"),
          col("n_docs"),
          when(max(col("n_docs")).over(Window.partitionBy()) === 0, lit(0.0))
            .otherwise(round(col("n_docs").cast("double") /
              max(col("n_docs")).over(Window.partitionBy()), 6)).as("retention"))
    }),

    // Domain-mix accounting: per-source doc and token shares — the
    // table a data-mixing (sampling-weight) stage reads. One groupBy;
    // the share window runs over the source-count rows (tiny).
    "pipe_domain_mix" -> ((s, d) => {
      val w = Window.partitionBy()
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text")).cast("long")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 6)
            .as("pct_docs"),
          round(col("n_tokens").cast("double") / sum(col("n_tokens")).over(w), 6)
            .as("pct_tokens"))
    }),

    // Dataset card / datasheet rollup — the release artifact every
    // published corpus ships with: one pass computes corpus-level
    // counts (docs, tokens, chars, language/source cardinalities,
    // PII-bearing docs), stacked into (metric, value) rows. ONE
    // aggregate over the scan — countDistinct on the two low-
    // cardinality label columns dedups in-aggregate; stack() is
    // map-side over the single result row.
    "pipe_dataset_card" -> ((s, d) =>
      Tables.documents(s, d)
        .agg(
          count(lit(1)).as("c0"),
          sum(tokenCount(col("text")).cast("long")).as("c1"),
          sum(length(col("text")).cast("long")).as("c2"),
          countDistinct(col("lang")).as("c3"),
          countDistinct(col("source")).as("c4"),
          sum((size(regexp_extract_all(col("text"), lit(PiiEmail), lit(0))) > 0)
            .cast("long")).as("c5"))
        .select(expr("stack(6, 0, 'n_docs', c0, 1, 'n_tokens', c1, " +
          "2, 'n_chars', c2, 3, 'n_langs', c3, 4, 'n_sources', c4, " +
          "5, 'n_docs_with_email', c5) AS (metric_idx, metric, value)"))
        .select(col("metric_idx").cast("long").as("metric_idx"),
          col("metric"), col("value"))),

    // Token-BUDGET allocation — the planning step upstream of the
    // mixing weights: split a fixed training-token budget (here half
    // the corpus) across sources proportionally to their token mass,
    // by the largest-remainder method — quotas are ⌊B·Tᵢ/T⌋ plus one
    // extra token for the sources with the largest division remainders
    // until the budget is exact. Everything is integer (DECIMAL(38)
    // cross products — B·Tᵢ overflows int64 at real corpus sizes), so
    // quotas are deterministic across engines AND sum to B exactly —
    // the property float-share rounding cannot give. The remainder
    // rank runs on the per-source rows (bounded by source cardinality,
    // like every mix table here), after one map-combining corpus scan.
    "pipe_token_budget" -> ((s, d) => {
      // persisted: the totals row AND the quota rows both derive from
      // this source-cardinality table — without the pin the corpus
      // scans twice (once under the broadcast totals, once as probe)
      val perSrc = graft.CacheRegistry.persistTracked(
        Tables.documents(s, d)
          .groupBy("source")
          .agg(sum(tokenCount(col("text")).cast("long")).as("n_tokens")))
      val tot = perSrc.agg(sum(col("n_tokens")).as("tt"),
        expr("sum(n_tokens) div 2").as("b"))
      val wAll = Window.partitionBy()
      val wRank = Window.orderBy(col("rem").desc, col("source"))
      perSrc.crossJoin(broadcast(tot))
        .withColumn("prod",
          expr("CAST(b AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0))"))
        .withColumn("quota0", expr("CAST(prod div tt AS BIGINT)"))
        .withColumn("rem", expr("CAST(prod % tt AS BIGINT)"))
        .withColumn("leftover", col("b") - sum(col("quota0")).over(wAll))
        .withColumn("rk", row_number().over(wRank))
        .select(col("source"), col("n_tokens"),
          (col("quota0") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("quota"))
    }),

    // Domain RESAMPLING — the step that turns mixing weights into an
    // actual corpus (Pile/LLaMA-style "source × epochs"): each doc is
    // emitted ⌊w⌋ times plus one more with probability frac(w), so a
    // lang at w=2.5 contributes ~2.5 epochs. The fractional inclusion
    // is a deterministic integer-rational test — (doc_id mod 1e6) ·
    // 2654435761 mod 1e6 < frac·1e6 — no floats, no rand(): the same
    // doc is always in or out, reproducible across runs, engines, and
    // partitionings (rand() here would poison caches AND grading).
    // Copies materialize via explode (the real resampler's row shape —
    // a writer would stream these out); the graded result is the
    // per-lang epoch accounting.
    "pipe_domain_resample" -> ((s, d) => {
      import s.implicits._
      // (lang, whole epochs, fractional-inclusion threshold in ppm)
      val weights = broadcast(Seq(
        ("en", 0L, 500000L), // 0.5 epochs: downsample the head lang
        ("zh", 2L, 0L),      // 2.0
        ("es", 1L, 500000L), // 1.5
        ("de", 2L, 500000L), // 2.5
        ("fr", 1L, 0L))      // 1.0
        .toDF("lang", "w_floor", "w_frac_ppm"))
      Tables.documents(s, d)
        .join(weights, Seq("lang"))
        .withColumn("u",
          pmod(pmod(col("doc_id"), lit(1000000L)) * lit(2654435761L), lit(1000000L)))
        .withColumn("copies",
          col("w_floor") + when(col("u") < col("w_frac_ppm"), 1L).otherwise(0L))
        .where(col("copies") > 0)
        .select(col("lang"), col("doc_id"),
          tokenCount(col("text")).cast("long").as("toks"),
          explode(sequence(lit(1L), col("copies"))).as("copy_i"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs_resampled"),
          sum(col("toks")).as("n_tokens_resampled"),
          countDistinct(col("doc_id")).as("n_docs_source"))
    }),

    // Distinctive terms per document, TF-IDF style. The idf is the
    // RATIONAL proxy tf/df — ln() is libm-dependent and would break
    // bit-exact cross-engine grading, while tf/df ranks identically for
    // a fixed corpus (ln(N/df) is monotone in 1/df). Top-3 per doc,
    // ties broken by term; the rank filter pushes into the window sort.
    "text_tfidf_terms" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val byScore = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)
      // df as a count window over tf's term partitioning (r18 scan
      // census): the old groupBy+join re-derived the whole tf pipeline
      // — the tokenizer and the (doc, term) aggregate ran TWICE and the
      // join shuffled tf a second time. df = the number of tf rows per
      // term, which is exactly count(*) over the term partition — one
      // tokenize pass, one tf aggregate, the same per-term exchange the
      // join's left side paid anyway (the text_bigram_coverage shape).
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .withColumn("score", round(col("tf").cast("double") / col("df"), 6))
        .withColumn("rn", row_number().over(byScore))
        .where(col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    }),

    // Stratified sampling: a fixed quota per language, chosen by a
    // deterministic hash order (multiplicative hash in exact integer
    // arithmetic — reproducible on any engine, unlike rand(seed), and
    // stable under corpus growth: a doc keeps its rank unless hashier
    // docs arrive). One shuffle on the stratum key; the per-group limit
    // pushes into the window sort (WindowGroupLimit), so no stratum is
    // ever fully materialized.
    "pipe_stratified_sample" -> ((s, d) => {
      val quota = 20
      val byHash = Window.partitionBy("lang")
        .orderBy(col("h").asc, col("doc_id").asc)
      // reduce BEFORE multiplying: (id % 2^30-ish prime) * A tops out at
      // ~2.9e18 < Long.Max, so the arithmetic is exact for ANY doc_id —
      // a bare id * A would silently wrap past id ≈ 3.5e9 in Spark and
      // overflow-error in DuckDB
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          pmod(pmod(col("doc_id"), lit(1073741789L)) * lit(2654435761L),
            lit(4294967291L)).as("h"))
        .withColumn("rn", row_number().over(byHash))
        .where(col("rn") <= quota)
        .select(col("doc_id"), col("lang"), col("h"))
    }),

    // Vocabulary-coverage curve: what fraction of all token occurrences
    // the top-K most frequent tokens cover — the datapoint a
    // tokenizer/vocab-size decision reads. K = 5/10/25 keeps the curve
    // populated on the synthetic 31-term vocabulary; a real corpus uses
    // 1e3..1e5 with the identical plan. The token count is one
    // map-side-combined shuffle; the top-K head is a TakeOrdered (no
    // global sort of the vocabulary), and the cumsum window runs on
    // those few rows only. Rows for a K larger than the vocabulary are
    // absent on both engines alike.
    "pipe_vocab_coverage" -> ((s, d) => {
      // pinned (r18 scan census): counts feeds both the grand total and
      // the top-K head, and unpersisted it ran the tokenize + term
      // aggregate pipeline twice. The pin is vocabulary-cardinality.
      val counts = graft.CacheRegistry.persistTracked(
        Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt")))
      val total = counts.agg(sum(col("cnt")).as("total_tokens"))
      val byCnt = Window.partitionBy().orderBy(col("cnt").desc, col("term").asc)
      counts.orderBy(col("cnt").desc, col("term").asc).limit(25)
        .withColumn("k", row_number().over(byCnt).cast("long"))
        .withColumn("covered_tokens", sum(col("cnt")).over(
          byCnt.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("k").isin(5L, 10L, 25L))
        .crossJoin(broadcast(total))
        .select(col("k"), col("covered_tokens"), col("total_tokens"),
          round(col("covered_tokens").cast("double") / col("total_tokens"), 6)
            .as("coverage"))
        .orderBy("k")
    }),

    // Ordered conversion funnel over the event stream: users whose
    // first view precedes a click that precedes a purchase. Strict
    // event-time ordering (not mere presence) — the thing a naive
    // GROUP BY count(DISTINCT event_type) gets wrong. All three stages
    // aggregate on user_id, so one hash partitioning serves the chain.
    // r18 census note: the unpersisted chain re-executes the view
    // pipeline 3x and the click pipeline 2x (6 event scans for a
    // 3-stage funnel). Pinning v/c was tried and MEASURED SLOWER at
    // bench scale (interleaved A/B, non-overlapping: 0.79-0.91 s ->
    // 1.00-1.38 s) — two materialization barriers cost more than the
    // three saved pushdown scans here. Kept unpersisted; at fact-table
    // scale the pins win (3 fewer full scans + exchanges) and the
    // change is a two-line persistTracked when that regime arrives.
    "q_events_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts") > col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts") > col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      val stage = (idx: Int, name: String, df: org.apache.spark.sql.DataFrame) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"), col("n_users"))
      stage(0, "view", v).unionByName(stage(1, "view_click", c))
        .unionByName(stage(2, "view_click_purchase", p))
    }),

    // Time-bounded conversion funnel — the production form of the
    // funnel above: each stage must land within 7 days of the previous
    // stage's first event, because an unbounded funnel credits a
    // purchase made a year after the view. Identical one-partitioning
    // join chain; the window constraint is a post-join filter on exact
    // microsecond timestamps (interval arithmetic is exact integer
    // micros on both engines). Sized to this corpus's ~3.5-day mean
    // per-stream gap so the bound genuinely discriminates against the
    // unbounded tier.
    "q_events_funnel_windowed" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val gap = expr("INTERVAL 7 DAYS")
      // unpersisted like q_events_funnel — same measured A/B verdict
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id")
        .where(col("ts") > col("v_ts") && col("ts") <= col("v_ts") + gap)
        .groupBy("user_id").agg(min("ts").as("c_ts"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id")
        .where(col("ts") > col("c_ts") && col("ts") <= col("c_ts") + gap)
        .groupBy("user_id").agg(min("ts").as("p_ts"))
      val stage = (idx: Int, name: String, df: org.apache.spark.sql.DataFrame) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"), col("n_users"))
      stage(0, "view", v).unionByName(stage(1, "view_click_7d", c))
        .unionByName(stage(2, "view_click_purchase_7d", p))
    }))

  private val stopwordsSql = stopwordsSqlList

  private val gramCtes =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS ts
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(ts) - ${N - 2}),
       |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4])) AS gs
       |  FROM toks WHERE len(ts) >= $N)""".stripMargin

  override def oracles: Map[String, String] = {
    val base = Map(
    "text_pii_scan" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$PiiEmail')) AS n_emails,
         |  len(regexp_extract_all(text, '$PiiPhone')) AS n_phones,
         |  len(regexp_extract_all(text, '$PiiIp')) AS n_ips,
         |  len(regexp_extract_all(text, '$PiiLongNum')) AS n_longnums,
         |  length(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$PiiEmail', '<EMAIL>', 'g'), '$PiiPhone', '<PHONE>', 'g'),
         |    '$PiiIp', '<IP>', 'g')) AS redacted_len
         |FROM documents""".stripMargin,

    "q_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        |         count(*) AS gsz
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT gsz AS group_size, count(*) AS n_groups,
        |  CAST(sum(gsz) AS BIGINT) AS n_customers,
        |  CASE WHEN gsz < 5 THEN 1 ELSE 0 END AS at_risk
        |FROM cls GROUP BY gsz""".stripMargin,

    "pipe_dataset_card" ->
      s"""WITH a AS (
         |  SELECT count(*) AS c0,
         |    CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |      x -> length(x) > 0))) AS BIGINT) AS c1,
         |    CAST(sum(length(text)) AS BIGINT) AS c2,
         |    count(DISTINCT lang) AS c3,
         |    count(DISTINCT source) AS c4,
         |    CAST(sum(CASE WHEN len(regexp_extract_all(text, '$PiiEmail')) > 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c5
         |  FROM documents)
         |SELECT CAST(0 AS BIGINT) AS metric_idx, 'n_docs' AS metric, c0 AS value FROM a
         |UNION ALL SELECT 1, 'n_tokens', c1 FROM a
         |UNION ALL SELECT 2, 'n_chars', c2 FROM a
         |UNION ALL SELECT 3, 'n_langs', c3 FROM a
         |UNION ALL SELECT 4, 'n_sources', c4 FROM a
         |UNION ALL SELECT 5, 'n_docs_with_email', c5 FROM a""".stripMargin,

    "pipe_token_budget" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> length(x) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt,
        |             CAST(sum(n_tokens) // 2 AS BIGINT) AS b FROM t),
        |q AS (
        |  SELECT source, n_tokens, b,
        |    CAST((CAST(b AS HUGEINT) * n_tokens) // tt AS BIGINT) AS quota0,
        |    CAST((CAST(b AS HUGEINT) * n_tokens) % tt AS BIGINT) AS rem
        |  FROM t, g),
        |r AS (
        |  SELECT source, n_tokens, quota0,
        |    b - sum(quota0) OVER () AS leftover,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM q)
        |SELECT source, n_tokens,
        |  CAST(quota0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM r""".stripMargin,

    // gram identity via the same PolyHash64 replay the span-fraction
    // oracle uses (HUGEINT chain; h stays internal to each engine, so
    // signed-vs-unsigned representation cannot matter — only the
    // partition it induces does, and that is identical).
    "pipe_leakage_matrix" ->
      s"""WITH toks AS (
         |  SELECT source, list_filter(string_split_regex(lower(text), '\\s+'),
         |                             t -> length(t) > 0) AS ts
         |  FROM documents),
         |sg AS (
         |  SELECT DISTINCT source,
         |    list_reduce(
         |      list_prepend(CAST(1125899906842597 AS HUGEINT),
         |        list_transform(range(1, length(s) + 1),
         |          i -> CAST(ord(substr(s, i, 1)) AS HUGEINT))),
         |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS h
         |  FROM (
         |    SELECT source, unnest(list_distinct(list_transform(range(1, len(ts) - ${N - 2}),
         |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]))) AS s
         |    FROM toks WHERE len(ts) >= $N)),
         |sdf AS (SELECT h, count(*) AS sdf FROM sg GROUP BY 1),
         |ok AS (SELECT sg.source, sg.h FROM sg JOIN sdf USING (h)
         |       WHERE sdf >= 2 AND sdf <= $LeakDfCap)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(*) AS shared_grams
         |FROM ok a JOIN ok b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2
         |ORDER BY shared_grams DESC, source_a, source_b LIMIT 20""".stripMargin,

    "pipe_decontaminate" ->
      s"""WITH $gramCtes,
         |ev AS (SELECT doc_id, unnest(gs) AS s FROM g WHERE doc_id % 50 = 0),
         |tr AS (SELECT DISTINCT s FROM (SELECT unnest(gs) AS s FROM g WHERE doc_id % 50 <> 0)
         |       WHERE s IN (SELECT s FROM ev)),
         |hits AS (SELECT ev.doc_id, count(*) AS n FROM ev JOIN tr ON ev.s = tr.s GROUP BY 1)
         |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
         |  CAST(coalesce(hits.n, 0) AS BIGINT) AS n_contaminated,
         |  round(coalesce(hits.n, 0) * 1.0 / len(gs), 6) AS contamination
         |FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
         |WHERE g.doc_id % 50 = 0""".stripMargin,

    // Same 3-gram shingle universe as the dedup-family oracles (string
    // shingles stand in for the Spark side's injective-in-practice
    // 8-byte hashes); the eval-df cap and threshold interpolate from
    // the SAME Scala constants the plan uses.
    "pipe_decontaminate_fuzzy" -> {
      val cap = fuzzyEvalDfCap
      val eidxCte =
        if (cap <= 0) "eidx AS (SELECT eval_id, s FROM eex)"
        else
          s"""edf AS (SELECT s, count(*) AS edf FROM eex GROUP BY 1),
             |eidx AS (SELECT eval_id, s FROM eex JOIN edf USING (s) WHERE edf <= $cap)""".stripMargin
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS ts
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
         |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingles
         |  FROM toks WHERE len(ts) >= 3),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |eex AS (SELECT doc_id AS eval_id, s FROM ex WHERE doc_id % 50 = 0),
         |$eidxCte,
         |esz AS (SELECT eval_id, count(*) AS n_eval FROM eidx GROUP BY 1),
         |c AS (
         |  SELECT t.doc_id AS train_id, e.eval_id, count(*) AS c
         |  FROM ex t JOIN eidx e USING (s) WHERE t.doc_id % 50 <> 0
         |  GROUP BY 1, 2)
         |SELECT eval_id, train_id, n_eval, c,
         |  round(c * 1.0 / n_eval, 6) AS containment
         |FROM c JOIN esz USING (eval_id)
         |WHERE round(c * 1.0 / n_eval, 6) >= $FuzzyThreshold""".stripMargin
    },

    "pipe_quality_funnel" ->
      s"""WITH q AS (
         |  SELECT lang, n_chars,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS n_toks,
         |    len(list_filter(string_split_regex(lower(text), '\\s+'),
         |        t -> length(t) > 0 AND t IN $stopwordsSql)) AS n_stop
         |  FROM documents),
         |a AS (
         |  SELECT count(*) AS s0,
         |    coalesce(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 0) AS s1,
         |    coalesce(sum(CASE WHEN lang = 'en' AND n_chars >= 100 THEN 1 ELSE 0 END), 0) AS s2,
         |    coalesce(sum(CASE WHEN lang = 'en' AND n_chars >= 100 AND n_toks >= 30 THEN 1 ELSE 0 END), 0) AS s3,
         |    coalesce(sum(CASE WHEN lang = 'en' AND n_chars >= 100 AND n_toks >= 30 AND n_stop > 0 THEN 1 ELSE 0 END), 0) AS s4
         |  FROM q),
         |st AS (
         |  SELECT 0 AS stage_idx, 'all' AS stage, s0 AS n_docs FROM a
         |  UNION ALL SELECT 1, 'lang_en', s1 FROM a
         |  UNION ALL SELECT 2, 'min_chars', s2 FROM a
         |  UNION ALL SELECT 3, 'min_toks', s3 FROM a
         |  UNION ALL SELECT 4, 'has_stopwords', s4 FROM a)
         |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CASE WHEN max(n_docs) OVER () = 0 THEN 0.0
         |       ELSE round(n_docs * 1.0 / max(n_docs) OVER (), 6) END AS retention
         |FROM st""".stripMargin,

    "pipe_domain_mix" ->
      """WITH m AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(len(list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0))) AS n_tokens
        |  FROM documents GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(n_docs * 1.0 / sum(n_docs) OVER (), 6) AS pct_docs,
        |  round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS pct_tokens
        |FROM m""".stripMargin,

    // the identical integer-rational inclusion replayed in SQL
    "pipe_domain_resample" ->
      """WITH w(lang, w_floor, w_frac_ppm) AS (
        |  VALUES ('en', 0, 500000), ('zh', 2, 0), ('es', 1, 500000),
        |         ('de', 2, 500000), ('fr', 1, 0)),
        |c AS (
        |  SELECT d.lang, d.doc_id,
        |    len(list_filter(string_split_regex(lower(d.text), '\s+'), t -> length(t) > 0)) AS toks,
        |    w.w_floor + CASE WHEN (d.doc_id % 1000000) * 2654435761 % 1000000
        |      < w.w_frac_ppm THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN w ON d.lang = w.lang)
        |SELECT lang,
        |  CAST(sum(copies) AS BIGINT) AS n_docs_resampled,
        |  CAST(sum(copies * toks) AS BIGINT) AS n_tokens_resampled,
        |  CAST(count(*) AS BIGINT) AS n_docs_source
        |FROM c WHERE copies > 0 GROUP BY 1""".stripMargin,

    "text_tfidf_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0)) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        |r AS (
        |  SELECT doc_id, tfc.term, tf, df, round(tf * 1.0 / df, 6) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY round(tf * 1.0 / df, 6) DESC, tfc.term ASC) AS rn
        |  FROM tfc JOIN dfc ON tfc.term = dfc.term)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rn <= 3""".stripMargin,

    "pipe_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, ((doc_id % 1073741789) * 2654435761) % 4294967291 AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS rn
        |  FROM h)
        |SELECT doc_id, lang, CAST(h AS BIGINT) AS h FROM r WHERE rn <= 20""".stripMargin,

    "pipe_vocab_coverage" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM c),
        |r AS (
        |  SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, term ASC) AS k,
        |    sum(cnt) OVER (ORDER BY cnt DESC, term ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c)
        |SELECT CAST(k AS BIGINT) AS k, CAST(cum AS BIGINT) AS covered_tokens,
        |  CAST(total AS BIGINT) AS total_tokens,
        |  round(cum * 1.0 / total, 6) AS coverage
        |FROM r, tot WHERE k IN (5, 10, 25) ORDER BY k""".stripMargin,

    "q_events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
        |  CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
        |UNION ALL SELECT 1, 'view_click', CAST((SELECT count(*) FROM c) AS BIGINT)
        |UNION ALL SELECT 2, 'view_click_purchase', CAST((SELECT count(*) FROM p) AS BIGINT)""".stripMargin,

    "q_events_funnel_windowed" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |    AND e.ts <= v.v_ts + INTERVAL 7 DAY GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |    AND e.ts <= c.c_ts + INTERVAL 7 DAY GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage,
        |  CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
        |UNION ALL SELECT 1, 'view_click_7d', CAST((SELECT count(*) FROM c) AS BIGINT)
        |UNION ALL SELECT 2, 'view_click_purchase_7d', CAST((SELECT count(*) FROM p) AS BIGINT)""".stripMargin)

    // The report's oracle COMPOSES the three pass oracles verbatim as
    // CTEs (nested WITH is legal DuckDB), so an oracle change in any
    // pass propagates here automatically and the report can never
    // drift from its inputs.
    base + ("pipe_decontaminate_report" ->
      s"""WITH spine AS (
         |  SELECT doc_id AS eval_id FROM documents WHERE doc_id % 50 = 0),
         |exr AS (${base("pipe_decontaminate")}),
         |fzr AS (${base("pipe_decontaminate_fuzzy")}),
         |smr AS (${graft.queries.DedupQueries.oracles("pipe_decontaminate_semantic")}),
         |fmax AS (SELECT eval_id, max(containment) AS v FROM fzr GROUP BY 1),
         |smax AS (SELECT eval_id, max(sim) AS v FROM smr GROUP BY 1)
         |SELECT spine.eval_id,
         |  coalesce(exr.contamination, 0.0) AS exact_contamination,
         |  coalesce(fmax.v, 0.0) AS fuzzy_max_containment,
         |  coalesce(smax.v, 0.0) AS semantic_max_sim,
         |  CAST(CASE WHEN coalesce(exr.n_contaminated, 0) > 0
         |            OR fmax.v IS NOT NULL
         |            OR smax.v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS flagged
         |FROM spine
         |LEFT JOIN exr ON spine.eval_id = exr.doc_id
         |LEFT JOIN fmax ON spine.eval_id = fmax.eval_id
         |LEFT JOIN smax ON spine.eval_id = smax.eval_id""".stripMargin)
  }
}
