package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.{HashFunctions, PolyHash64Expr}

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

    // Good–Turing frequency-of-frequencies: how many bigram types occur
    // exactly r times (r capped at 20, 21 = tail bucket) plus the token
    // mass each bucket holds — the count-of-counts table every smoothed
    // n-gram LM estimate starts from (and the vocabulary-truncation
    // planning input for tokenizer training). Bigram types, not
    // unigrams: the corpus vocabulary is a closed token pool, so the
    // unigram spectrum collapses into the tail at every SF — the
    // combinatorial type space is where N_1/N_2 live. Two
    // map-combinable hash aggregates: bigrams → per-type counts (type
    // cardinality, crushed map-side), then type counts → ≤21 bucket
    // rows. Nothing wider than (bigram, count) ever shuffles, so the
    // shape holds at corpus scale.
    "text_count_of_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .select(tokens(col("text")).as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .select(least(col("c"), lit(21L)).as("freq_bucket"), col("c"))
        .groupBy("freq_bucket")
        .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"))),

    // Corpus drift / domain divergence: the top bigram types whose
    // document frequency differs most between the reference domain
    // (deterministically the lexicographically-smallest source) and
    // the rest of the corpus — the monitor a curation pipeline runs
    // when a new crawl snapshot lands. The ranking key is the exact
    // integer cross product |df_a·n_b − df_b·n_a| (the scale-invariant
    // df_a/n_a − df_b/n_b comparison cleared of divisions — DECIMAL(38)
    // here, HUGEINT in the oracle, so the board is exact, no float
    // ranking anywhere); TakeOrdered board, full tie-break. Per-doc
    // distinct bigrams crush map-side; only (bigram, two counters)
    // shuffles.
    "text_domain_divergence" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // one source-cardinality aggregate supplies the reference-domain
      // pick AND both corpus totals (persisted: it feeds its own min
      // and the conditional sums) — the text scan happens exactly once,
      // in the df pass below.
      val srcCounts = graft.CacheRegistry.persistTracked(
        docs.groupBy("source").agg(count(lit(1)).as("n")))
      val tot = broadcast(srcCounts
        .crossJoin(broadcast(srcCounts.agg(min(col("source")).as("src_a"))))
        .agg(max(col("src_a")).as("src_a"),
          sum(when(col("source") === col("src_a"), col("n")).otherwise(0L)).as("n_a"),
          sum(when(col("source") =!= col("src_a"), col("n")).otherwise(0L)).as("n_b")))
      val dfs = docs.crossJoin(tot.select("src_a"))
        .select((col("source") === col("src_a")).as("in_a"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 2)
        .select(col("in_a"), explode(array_distinct(expr(
          "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))).as("b"))
        .groupBy("b").agg(
          sum(when(col("in_a"), 1L).otherwise(0L)).as("df_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("df_b"))
      dfs.crossJoin(tot.select("n_a", "n_b"))
        .withColumn("scored", abs(
          col("df_a").cast("decimal(38,0)") * col("n_b") -
            col("df_b").cast("decimal(38,0)") * col("n_a")))
        .orderBy(col("scored").desc, col("b"))
        .limit(20)
        .select(col("b").as("bigram"), col("df_a"), col("df_b"),
          col("scored").cast("double").as("score"))
    }),

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

    // Tokenizer fertility per source — the tokenizer-evaluation rollup
    // a vocab decision runs per domain: subwords per whitespace word
    // (BPE fertility; 1.0 = every word is one token, higher = the
    // domain fragments) and chars per subword (compression), from the
    // SAME committed 200-rule merge table text_token_stats grades.
    // Integer sums off one map-side pass + a source-cardinality
    // aggregate; the two ratios are single double divisions of exact
    // int64 sums (the q_regr_slope discipline), so the row hashes.
    "text_token_fertility" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), tokenCount(col("text")).as("w"),
          subwordCount(col("text")).as("sw"), length(col("text")).as("ch"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w")).cast("long").as("n_words"),
          sum(col("sw")).cast("long").as("n_subwords"),
          sum(col("ch")).cast("long").as("n_chars"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_subwords"), col("n_chars"),
          round(when(col("n_words") === 0, 0.0)
            .otherwise(col("n_subwords").cast("double") / col("n_words")), 6)
            .as("fertility"),
          round(when(col("n_subwords") === 0, 0.0)
            .otherwise(col("n_chars").cast("double") / col("n_subwords")), 6)
            .as("chars_per_subword"))),

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

    // Script-composition profile — the mixed-script spam/injection
    // detector a multilingual curation pipeline runs per document:
    // every code point classified into a closed range table
    // ([[ScriptRanges]], ONE Scala constant feeding the kernel AND the
    // oracle's lambda predicates — the Bm25-constants discipline), with
    // a flag for documents mixing two or more letter scripts (latin +
    // CJK/greek/cyrillic — the classic homoglyph-spam signature). One
    // code-point pass per doc, pure integers, zero shuffle: a per-doc
    // projection that scales with input splits at any corpus size. On
    // the ASCII driver corpus the non-latin counts are zeros; the
    // unicode-injection axis (tools/unicodify.py) is where this row's
    // classification logic is actually exercised cross-engine.
    "text_script_mix" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), scriptCounts(col("text")).as("c"))
        .select(col("doc_id"),
          col("c")(0).as("n_cp"), col("c")(1).as("n_latin"),
          col("c")(2).as("n_digit"), col("c")(3).as("n_space"),
          col("c")(4).as("n_cjk"), col("c")(5).as("n_greek"),
          col("c")(6).as("n_cyrillic"))
        .withColumn("n_other",
          col("n_cp") - col("n_latin") - col("n_digit") - col("n_space") -
            col("n_cjk") - col("n_greek") - col("n_cyrillic"))
        .withColumn("is_mixed",
          (when(col("n_latin") > 0, 1).otherwise(0) +
            when(col("n_cjk") > 0, 1).otherwise(0) +
            when(col("n_greek") > 0, 1).otherwise(0) +
            when(col("n_cyrillic") > 0, 1).otherwise(0) >= 2)
            .cast("long"))),

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
    }),

    // Readability scoring (Flesch reading-ease shape): sentence count,
    // word count, and vowel-group syllable approximation are INTEGER
    // counts from one map-side pass; the score is the classic formula
    // evaluated in one fixed op sequence (two correctly-rounded
    // divisions of exact integers, two products, two subtractions —
    // identical order on both engines, so the doubles match bit-for-
    // bit). Zero-sentence/word guards via greatest(1, ·). No shuffle
    // beyond the per-doc projection — linear at any corpus size.
    "text_readability" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          greatest(lit(1), size(expr(
            "filter(split(text, '[.!?]+'), x -> length(trim(x)) > 0)"))).as("n_sents"),
          greatest(lit(1), tokenCount(col("text"))).as("n_words"),
          size(regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0)))
            .as("n_syll"))
        .select(col("doc_id"), col("n_sents").cast("long").as("n_sents"),
          col("n_words").cast("long").as("n_words"),
          col("n_syll").cast("long").as("n_syll"),
          round(lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sents"))
            - lit(84.6) * (col("n_syll").cast("double") / col("n_words")), 6)
            .as("flesch"))),

    // Conditional-bigram surprisal score — the LM-perplexity quality
    // filter (CCNet shape: a language model trained on the reference
    // corpus scores each document; high average surprisal = junk),
    // trained corpus-relative like text_bigram_coverage's df but on the
    // CONDITIONAL distribution P(b|a): cost(a→b) uses c(ab) against
    // c(a as bigram head), so a bigram is cheap when it is the usual
    // continuation of its head, not merely when it is globally common.
    // log2 arrives as ⌊log2 c⌋ via binary-representation length —
    // INTEGER on both engines, so unlike a float log-prob sum the score
    // hash-grades exactly; the ±1-bit granularity (~0.7 nats) is noise
    // relative to the junk/prose gap this filter acts on. Shape: one
    // scan, two window counts over the exploded pair rows (no
    // self-join, no second scan), one doc aggregation — three
    // map-combining exchanges at any corpus size.
    "text_lm_surprisal" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-2), i -> struct(t[i] AS a, concat(t[i], ' ', t[i+1]) AS ab))")).as("p"))
        .select(col("doc_id"), col("p.a").as("a"), col("p.ab").as("ab"))
      val wab = org.apache.spark.sql.expressions.Window.partitionBy("ab")
      val wa = org.apache.spark.sql.expressions.Window.partitionBy("a")
      bg.withColumn("cab", count(lit(1)).over(wab))
        .withColumn("ca", count(lit(1)).over(wa))
        .select(col("doc_id"),
          (lit(100) * (length(bin(col("ca"))) - length(bin(col("cab"))))).as("cost"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("cost")).as("total_cost"),
          (sum(col("cost")).cast("double") / count(lit(1))).as("avg_cost"))
    }),

    // Corpus-level duplicated-segment removal WITH document
    // reconstruction — the C4/RefinedWeb "line dedup" pass (their unit
    // is the newline-delimited line; this corpus is single-line, so the
    // unit is a fixed 10-token segment — same operator, same shape).
    // Every occurrence of a segment text except the first (smallest
    // (doc_id, pos)) is removed; each document is then reassembled
    // from its kept segments in position order and fingerprinted. This
    // is the one dedup tier that REWRITES documents rather than just
    // identifying duplicate pairs/survivors.
    //
    // Scale shape: segments carry an 8-byte PolyHash64 key, so the
    // keep-first decision is ONE window (min(struct(doc_id,pos)) over
    // the hash partitioning) — no self-join, no string shuffle beyond
    // the segment rows themselves — and reassembly is the one doc_id
    // aggregation. Two shuffles total at any corpus size; a hot
    // boilerplate segment lands in one hash partition where AQE skew
    // split applies. (The oracle groups by the segment STRING; with
    // ~2·10^5 distinct segments per sf0.1-sized corpus the 64-bit
    // collision odds are ~10^-9, and any collision would be
    // deterministic, not flaky.)
    "text_line_dedup" -> ((s, d) => {
      val segLen = 10
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= 1)
      val segs = toks
        .select(col("doc_id"), posexplode(stridedWindows("t", segLen, segLen)))
        .select(col("doc_id"), col("pos"), array_join(col("col"), " ").as("seg"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))
      val marked = segs
        .withColumn("h", PolyHash64Expr(col("seg")))
        .withColumn("keeper", min(struct(col("doc_id"), col("pos"))).over(w))
        .withColumn("kept",
          col("keeper.doc_id") === col("doc_id") && col("keeper.pos") === col("pos"))
      marked.groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          collect_list(when(col("kept"), struct(col("pos"), col("seg")))).as("ks"))
        .select(col("doc_id"), col("n_segs"), col("n_kept"),
          PolyHash64Expr(array_join(expr("transform(array_sort(ks), x -> x.seg)"), " "))
            .as("cleaned_fp"))
    }),

    // Model-scoring harness: a fasttext-style linear text classifier
    // run the way a trained quality model runs at corpus scale — the
    // (small) vocabulary→weight table broadcasts, tokens map-side
    // join against it, and the per-document margin is one aggregation.
    // The weights are REAL learned parameters (r8): an all-integer
    // perceptron trained over the committed labeled corpus, with
    // ClassifierSpec re-running the trainer to reproduce the table
    // exactly (see functions/ClassifierWeights.scala). Corpus tokens
    // outside the 103-token model vocabulary exercise the OOV path
    // (unscored, counted in n_tokens only). All-integer output; the
    // oracle replays the identical scoring join against the same
    // weights as a literal VALUES table.
    "text_classifier_score" -> ((s, d) => {
      import s.implicits._
      val vocab = graft.functions.ClassifierWeights.Weights.toDF("token", "w")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(col("w")).as("n_scored"),
          coalesce(sum(col("w")), lit(0L)).as("score"))
        .select(col("doc_id"), col("n_tokens"), col("n_scored"), col("score"),
          signum(col("score")).cast("long").as("pred"))
    }),

    // Uncertainty sampling — the annotate-next batch an active-learning
    // loop sends for labels (or to a teacher model): per source, the K
    // docs whose committed-perceptron margin sits closest to the
    // decision boundary (smallest |score|, doc_id tie-break — scores
    // are integer weight sums, so the ordering is exact on both
    // engines). Shape at 100 TB: one scoring pass (tokens reduce
    // map-side through the broadcast vocab), then the per-source top-k
    // is a WindowGroupLimit — each partition keeps K rows before the
    // single source-keyed exchange, so the sort never materializes a
    // corpus-wide ordering.
    "text_uncertainty_sample" -> ((s, d) => {
      import s.implicits._
      val vocab = graft.functions.ClassifierWeights.Weights.toDF("token", "w")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id", "source")
        .agg(coalesce(sum(col("w")), lit(0L)).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(abs(col("score")).asc, col("doc_id").asc)
      scored.withColumn("abs_score", abs(col("score")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= UncertaintyK)
        .select("source", "doc_id", "score", "abs_score", "rank")
    }),

    // Classifier threshold sweep — the keep-rate curve a curation run
    // reads before picking the quality-filter cutoff: for each margin
    // threshold × source, how many docs the committed perceptron would
    // keep (score ≥ t) and the keep rate. One per-doc scoring pass
    // (the text_classifier_score kernel, source carried through), then
    // the threshold axis expands MAP-SIDE on doc-cardinality rows (5
    // literals — an Expand, not a join) into a (threshold, source)
    // aggregate of a few dozen rows. Thresholds interpolate into the
    // oracle from the same Seq.
    "text_classifier_sweep" -> ((s, d) => {
      import s.implicits._
      val vocab = graft.functions.ClassifierWeights.Weights.toDF("token", "w")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id", "source")
        .agg(coalesce(sum(col("w")), lit(0L)).as("score"))
      scored
        .select(col("source"), col("score"),
          explode(array(SweepThresholds.map(lit(_)): _*)).as("threshold"))
        .groupBy("threshold", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= col("threshold"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("threshold"), col("source"), col("n_docs"), col("n_kept"),
          round(col("n_kept").cast("double") / col("n_docs"), 6).as("keep_rate"))
    }),

    // Distribution-drift monitor between the train/test halves of the
    // standard split (same doc_id%10<2 assignment as
    // q_train_test_split): per-token instance counts on each side,
    // ranked by the cross-multiplied integer imbalance
    // |train·N_test − test·N_train| — rate comparison with ZERO
    // divisions, so it replays exactly. Top-20 by (drift desc, token)
    // is a deterministic TakeOrdered; the totals are a 1-row broadcast.
    // (Products stay < 2^63 up to ~10^9-token corpora per side; at
    // 100 TB promote the multiply to DECIMAL(38,0) internally.)
    "text_split_drift" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(when(pmod(col("doc_id"), lit(10)) < 2, lit("test"))
          .otherwise(lit("train")).as("split"),
          explode(tokens(col("text"))).as("token"))
      // Persisted: both the ranked output and the 1-row totals read it,
      // and it is vocabulary-sized — without the pin the totals branch
      // re-scans and re-shuffles the whole corpus a second time.
      val cnts = graft.CacheRegistry.persistTracked(
        tok.groupBy("token").agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("train_cnt"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("test_cnt")))
      val totals = broadcast(cnts.agg(
        sum("train_cnt").as("n_train"), sum("test_cnt").as("n_test")))
      cnts.crossJoin(totals)
        .select(col("token"), col("train_cnt"), col("test_cnt"),
          abs(col("train_cnt") * col("n_test") - col("test_cnt") * col("n_train"))
            .as("drift"))
        .orderBy(col("drift").desc, col("token").asc)
        .limit(20)
    }),

    // BM25 retrieval — search over the corpus: score every document
    // against a fixed keyword query, return the top 20. Cross-engine
    // determinism: the idf is BM25's RATIONAL idf (N − df + ½)/(df + ½)
    // without the ln() — libm last-ulp behavior differs across engines
    // while +,×,÷ are IEEE-correctly-rounded; tf saturation and length
    // normalization are the standard k1=1.2, b=0.75 forms, every double
    // born from the same op sequence on both sides (constants written
    // as the same source expressions, e.g. (1.2+1), never pre-folded).
    // Per-doc summation is an ORDER-FIXED chain of per-term conditional
    // sums (≤1 non-null each), never sum() over doubles — float
    // addition does not reassociate. Shape: tf is (doc,term)-level with
    // the term filter applied at the explode; df (≤|query| rows)
    // broadcasts back; corpus totals are a 1-row broadcast; top-20 is
    // TakeOrdered.
    "text_bm25_topk" -> ((s, d) => {
      val terms = Bm25Terms
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val totals = broadcast(docs.agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("t")).cast("long")).as("total_len")))
      // persisted: both the df aggregate and the scoring join read the
      // postings, which are (matching doc × term)-sized — without the
      // pin the df branch re-scans and re-explodes the whole corpus
      val tf = graft.CacheRegistry.persistTracked(docs
        .select(col("doc_id"), size(col("t")).cast("long").as("len"),
          explode(col("t")).as("term"))
        .where(col("term").isin(terms: _*))
        .groupBy("doc_id", "len", "term").agg(count(lit(1)).as("tf")))
      val df = broadcast(tf.groupBy("term").agg(count(lit(1)).as("df")))
      val scored = tf.join(df, "term")
        .crossJoin(totals)
        .withColumn("idf",
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)))
        .withColumn("norm",
          lit(1 - Bm25B) + lit(Bm25B) *
            (col("len").cast("double") * col("n_docs") / col("total_len")))
        .withColumn("contrib",
          col("idf") * (col("tf").cast("double") * lit(Bm25K1 + 1)) /
            (col("tf").cast("double") + lit(Bm25K1) * col("norm")))
      val perTerm = terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("contrib"))).as(s"c_$i")
      }
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), perTerm: _*)
        .select(col("doc_id"), col("n_terms"),
          round(terms.indices.map(i => coalesce(col(s"c_$i"), lit(0.0)))
            .reduceLeft(_ + _), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
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
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    greatest(1, len(list_filter(string_split_regex(text, '[.!?]+'),
        |      x -> length(trim(x)) > 0))) AS n_sents,
        |    greatest(1, len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> length(x) > 0))) AS n_words,
        |    len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syll
        |  FROM documents)
        |SELECT doc_id, CAST(n_sents AS BIGINT) AS n_sents,
        |  CAST(n_words AS BIGINT) AS n_words, CAST(n_syll AS BIGINT) AS n_syll,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
        |    - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 6) AS flesch
        |FROM c""".stripMargin,

    // parallel unnests zip in DuckDB, so head and bigram stay aligned;
    // bin() length is the same ⌊log2⌋+1 the Spark side computes.
    "text_lm_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)), i -> t[i])) AS a,
        |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS ab
        |  FROM toks WHERE len(t) >= 2),
        |w AS (
        |  SELECT doc_id,
        |    100 * (length(bin(count(*) OVER (PARTITION BY a)))
        |         - length(bin(count(*) OVER (PARTITION BY ab)))) AS cost
        |  FROM bg)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(cost) AS BIGINT) AS total_cost,
        |  CAST(sum(cost) AS DOUBLE) / count(*) AS avg_cost
        |FROM w GROUP BY 1""".stripMargin,
    "text_token_count" ->
      """SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |      FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token""".stripMargin,

    "text_count_of_counts" ->
      """WITH t AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |                     x -> length(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
        |  FROM t WHERE len(t) >= 2),
        |tc AS (SELECT b, count(*) AS c FROM bg GROUP BY b)
        |SELECT least(c, 21) AS freq_bucket, count(*) AS n_types,
        |       CAST(sum(c) AS BIGINT) AS n_tokens
        |FROM tc GROUP BY 1""".stripMargin,

    "text_domain_divergence" ->
      """WITH a AS (SELECT min(source) AS src_a FROM documents),
        |dd AS (
        |  SELECT source = (SELECT src_a FROM a) AS in_a,
        |    list_distinct(list_transform(range(1, len(ts)),
        |      i -> ts[i] || ' ' || ts[i+1])) AS bs
        |  FROM (SELECT source,
        |          list_filter(string_split_regex(lower(text), '\s+'),
        |                      x -> length(x) > 0) AS ts
        |        FROM documents)
        |  WHERE len(ts) >= 2),
        |tot AS (
        |  SELECT CAST(sum(CASE WHEN source = (SELECT src_a FROM a) THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN source <> (SELECT src_a FROM a) THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM documents),
        |tc AS (
        |  SELECT b, CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS df_a,
        |         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS df_b
        |  FROM (SELECT in_a, unnest(bs) AS b FROM dd) GROUP BY 1)
        |SELECT b AS bigram, df_a, df_b,
        |  CAST(abs(CAST(df_a AS HUGEINT) * n_b - CAST(df_b AS HUGEINT) * n_a) AS DOUBLE) AS score
        |FROM tc, tot
        |ORDER BY abs(CAST(df_a AS HUGEINT) * n_b - CAST(df_b AS HUGEINT) * n_a) DESC, b
        |LIMIT 20""".stripMargin,

    "text_normalize_filter" ->
      """WITH n AS (
        |  SELECT lang, source,
        |         nullif(lower(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'), '^\s+|\s+$', '', 'g')), '') AS norm
        |  FROM documents)
        |SELECT lang, source, count(*) AS cnt, CAST(sum(length(norm)) AS BIGINT) AS total_len
        |FROM n
        |WHERE lang IN ('en','de') AND norm IS NOT NULL AND length(norm) >= 50
        |GROUP BY lang, source""".stripMargin,

    // n_subwords replays the committed 200-rule BPE merge chain: every
    // letter wrapped `(c)`, one replace per rule in training order
    // (staged CTEs — DuckDB's binder caps nesting), surviving `(`
    // groups are the units (see BpeMerges.oracleCtes).
    "text_token_stats" ->
      s"""WITH ${graft.functions.BpeMerges.oracleCtes("documents", "text")}
         |SELECT doc_id,
         |  len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS n_tokens,
         |  CAST(length(bpe) - length(replace(bpe, '(', ''))
         |    + len(regexp_extract_all(text, '[0-9]+'))
         |    + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS INTEGER) AS n_subwords,
         |  length(text) AS n_chars_computed
         |FROM ${graft.functions.BpeMerges.oracleFinalRelation()}""".stripMargin,

    // coalesce(text, ''): NULL text is an EMPTY document — all three
    // ratios 0.0, the qualityCounters contract (r13 null axis: the
    // unguarded form emitted NULL ratios where Spark emits 0.0)
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'), x -> length(x) > 0) AS toks
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
  // coalesce(text, ''): NULL text is an EMPTY document on both engines
  // (the r13 null-injection axis caught the unguarded form scoring
  // every len() NULL, falling through the CASE to 'de' while Spark
  // tags 'und')
  private val langidOracle =
    """WITH t AS (
      |  SELECT lang, list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'), x -> length(x) > 0) AS toks
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

  /** Segment dedup + reconstruction: row_number-keeps-first mirrors
    * Spark's min(struct(doc_id,pos)); the cleaned text's PolyHash64 is
    * the same HUGEINT fold as the fingerprint oracle (empty cleaned
    * text folds to the bare seed on both engines). */
  private val lineDedupOracle =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS t
      |  FROM documents),
      |segs AS (
      |  SELECT doc_id,
      |    unnest(range((len(t)+9)//10)) AS pos,
      |    unnest(list_transform(range((len(t)+9)//10),
      |      i -> array_to_string(t[(i*10+1):(i*10+10)], ' '))) AS seg
      |  FROM toks WHERE len(t) >= 1),
      |k AS (
      |  SELECT doc_id, pos, seg,
      |    CASE WHEN row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1
      |      THEN 1 ELSE 0 END AS kept
      |  FROM segs),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_segs, CAST(sum(kept) AS BIGINT) AS n_kept,
      |    coalesce(string_agg(CASE WHEN kept = 1 THEN seg END, ' ' ORDER BY pos), '') AS cleaned
      |  FROM k GROUP BY 1),
      |hashed AS (
      |  SELECT doc_id, n_segs, n_kept,
      |    list_reduce(
      |      list_prepend(CAST(1125899906842597 AS HUGEINT),
      |        list_transform(range(1, length(cleaned) + 1), i -> CAST(ord(substr(cleaned, i, 1)) AS HUGEINT))),
      |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS h
      |  FROM agg)
      |SELECT doc_id, n_segs, n_kept,
      |  CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
      |    THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS cleaned_fp
      |FROM hashed""".stripMargin

  /** Code-point range table for text_script_mix — ONE definition feeds
    * the Spark kernel's range checks AND the oracle's list_filter
    * predicates, so the classification can never drift between
    * engines. Classes are disjoint and checked in this order; a code
    * point matching none is "other". Ranges are inclusive. */
  private val ScriptRanges: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq(('A'.toInt, 'Z'.toInt), ('a'.toInt, 'z'.toInt)),
    "digit" -> Seq(('0'.toInt, '9'.toInt)),
    // exactly Java-regex \s (the tokenizer's whitespace set)
    "space" -> Seq((0x09, 0x0D), (0x20, 0x20)),
    // CJK punct + kana, unified ideographs, halfwidth/fullwidth forms
    "cjk" -> Seq((0x3000, 0x30FF), (0x4E00, 0x9FFF), (0xFF00, 0xFFEF)),
    "greek" -> Seq((0x0370, 0x03FF)),
    "cyrillic" -> Seq((0x0400, 0x04FF)))

  /** One code-point pass per document: [n_cp, per-class counts…] in
    * [[ScriptRanges]] order. Null text is the empty document (all
    * zeros) — the repo-wide null-text contract. A UDF for the same
    * reason as qualityCounters: one primitive pass instead of
    * len(ScriptRanges)+1 interpreted array traversals. */
  private val scriptCounts = {
    val ranges = ScriptRanges.map(_._2.toArray).toArray
    udf { (t: String) =>
      val out = new Array[Long](ranges.length + 1)
      if (t != null) {
        var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          out(0) += 1
          var k = 0
          var hit = false
          while (!hit && k < ranges.length) {
            val rs = ranges(k)
            var r = 0
            while (!hit && r < rs.length) {
              if (cp >= rs(r)._1 && cp <= rs(r)._2) { hit = true; out(k + 1) += 1 }
              r += 1
            }
            k += 1
          }
          i += Character.charCount(cp)
        }
      }
      out
    }
  }

  /** [[ScriptRanges]] as DuckDB lambda predicates. */
  private def scriptPred(cls: String): String =
    ScriptRanges.toMap.apply(cls)
      .map { case (lo, hi) =>
        if (lo == hi) s"c = $lo" else s"(c BETWEEN $lo AND $hi)"
      }
      .mkString(" OR ")

  /** Per-code-point classification replayed with ord(substr(…)) —
    * code-point exact on both engines, astral included. */
  private val scriptMixOracle: String =
    s"""WITH cps AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(coalesce(text, '')) + 1),
       |      i -> ord(substr(coalesce(text, ''), CAST(i AS INT), 1))) AS cs
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    len(cs) AS n_cp,
       |    len(list_filter(cs, c -> ${scriptPred("latin")})) AS n_latin,
       |    len(list_filter(cs, c -> ${scriptPred("digit")})) AS n_digit,
       |    len(list_filter(cs, c -> ${scriptPred("space")})) AS n_space,
       |    len(list_filter(cs, c -> ${scriptPred("cjk")})) AS n_cjk,
       |    len(list_filter(cs, c -> ${scriptPred("greek")})) AS n_greek,
       |    len(list_filter(cs, c -> ${scriptPred("cyrillic")})) AS n_cyrillic
       |  FROM cps)
       |SELECT doc_id, CAST(n_cp AS BIGINT) AS n_cp,
       |  CAST(n_latin AS BIGINT) AS n_latin,
       |  CAST(n_digit AS BIGINT) AS n_digit,
       |  CAST(n_space AS BIGINT) AS n_space,
       |  CAST(n_cjk AS BIGINT) AS n_cjk,
       |  CAST(n_greek AS BIGINT) AS n_greek,
       |  CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
       |  CAST(n_cp - n_latin - n_digit - n_space - n_cjk - n_greek - n_cyrillic
       |    AS BIGINT) AS n_other,
       |  CAST(CASE WHEN (CASE WHEN n_latin > 0 THEN 1 ELSE 0 END
       |      + CASE WHEN n_cjk > 0 THEN 1 ELSE 0 END
       |      + CASE WHEN n_greek > 0 THEN 1 ELSE 0 END
       |      + CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END) >= 2
       |    THEN 1 ELSE 0 END AS BIGINT) AS is_mixed
       |FROM c""".stripMargin

  /** Margin thresholds for the classifier keep-rate sweep — ONE Scala
    * definition feeds both the Spark explode axis and the oracle's
    * VALUES table (the Bm25 constants discipline). */
  private val SweepThresholds = Seq(-4L, -2L, 0L, 2L, 4L)

  /** Annotation-batch size per source of the uncertainty sampler. */
  private val UncertaintyK = 10

  /** Same scoring join as classifierOracle with `source` carried
    * through, then the per-source smallest-|margin| top-K. */
  private val uncertaintyOracle: String = {
    val values = graft.functions.ClassifierWeights.Weights
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH tok AS (
  SELECT doc_id, source, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS token
  FROM documents),
vocab(token, w) AS (VALUES $values),
sc AS (
  SELECT doc_id, source, CAST(coalesce(sum(w), 0) AS BIGINT) AS score
  FROM tok t LEFT JOIN vocab v USING (token) GROUP BY 1, 2),
r AS (
  SELECT source, doc_id, score, CAST(abs(score) AS BIGINT) AS abs_score,
    row_number() OVER (PARTITION BY source ORDER BY abs(score), doc_id) AS rank
  FROM sc)
SELECT source, doc_id, score, abs_score, rank FROM r WHERE rank <= $UncertaintyK"""
  }

  /** The committed perceptron weights replayed as a literal VALUES
    * table — the oracle scores with the SAME learned parameters the
    * engine ships (functions/ClassifierWeights.scala). */
  private val classifierOracle: String = {
    val values = graft.functions.ClassifierWeights.Weights
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS token
  FROM documents),
vocab(token, w) AS (VALUES $values),
j AS (SELECT t.doc_id, v.w FROM tok t LEFT JOIN vocab v USING (token))
SELECT doc_id, count(*) AS n_tokens, CAST(count(w) AS BIGINT) AS n_scored,
  CAST(coalesce(sum(w), 0) AS BIGINT) AS score,
  CAST(CASE WHEN coalesce(sum(w), 0) > 0 THEN 1
            WHEN coalesce(sum(w), 0) < 0 THEN -1 ELSE 0 END AS BIGINT) AS pred
FROM j GROUP BY 1"""
  }

  /** Same scoring join as classifierOracle with `source` carried
    * through, crossed with the shared threshold axis. */
  private val classifierSweepOracle: String = {
    val values = graft.functions.ClassifierWeights.Weights
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    val ths = SweepThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH tok AS (
  SELECT doc_id, source, unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0)) AS token
  FROM documents),
vocab(token, w) AS (VALUES $values),
sc AS (
  SELECT doc_id, source, CAST(coalesce(sum(w), 0) AS BIGINT) AS score
  FROM tok t LEFT JOIN vocab v USING (token) GROUP BY 1, 2),
th(threshold) AS (VALUES $ths)
SELECT CAST(threshold AS BIGINT) AS threshold, source, count(*) AS n_docs,
  CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  round(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS keep_rate
FROM sc, th GROUP BY 1, 2"""
  }

  /** Per-source rollup of the text_token_stats per-doc expressions —
    * the same BPE merge-chain CTEs, aggregated by source. */
  private val tokenFertilityOracle: String =
    s"""WITH ${graft.functions.BpeMerges.oracleCtes("documents", "text")},
       |per AS (
       |  SELECT source,
       |    len(list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0)) AS w,
       |    length(bpe) - length(replace(bpe, '(', ''))
       |      + len(regexp_extract_all(text, '[0-9]+'))
       |      + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS sw,
       |    length(text) AS ch
       |  FROM ${graft.functions.BpeMerges.oracleFinalRelation()})
       |SELECT source, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_words,
       |  CAST(sum(sw) AS BIGINT) AS n_subwords, CAST(sum(ch) AS BIGINT) AS n_chars,
       |  round(CASE WHEN sum(w) = 0 THEN 0.0 ELSE sum(sw) * 1.0 / sum(w) END, 6) AS fertility,
       |  round(CASE WHEN sum(sw) = 0 THEN 0.0 ELSE sum(ch) * 1.0 / sum(sw) END, 6) AS chars_per_subword
       |FROM per GROUP BY 1""".stripMargin

  private val splitDriftOracle =
    """WITH tok AS (
      |  SELECT CASE WHEN doc_id % 10 < 2 THEN 'test' ELSE 'train' END AS split,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0)) AS token
      |  FROM documents),
      |c AS (
      |  SELECT token,
      |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS train_cnt,
      |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS test_cnt
      |  FROM tok GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(train_cnt) AS BIGINT) AS n_train,
      |         CAST(sum(test_cnt) AS BIGINT) AS n_test FROM c)
      |SELECT token, train_cnt, test_cnt,
      |  CAST(abs(train_cnt * n_test - test_cnt * n_train) AS BIGINT) AS drift
      |FROM c, t
      |ORDER BY drift DESC, token LIMIT 20""".stripMargin

  /** Single source of truth for the BM25 parameters and query terms —
    * the Spark expressions AND the oracle string below interpolate
    * these (the WavAudio-constants discipline), so an edit recompiles
    * into BOTH sides instead of silently desynchronizing them. */
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val Bm25Terms = Seq("spark", "query", "fast")

  /** Every arithmetic step parenthesized to the exact association the
    * Spark expressions produce; constants appear as the same source
    * expressions (($Bm25K1 + 1), (1 - $Bm25B)) so both engines fold
    * them from identical doubles. */
  private val bm25Oracle = {
    val inList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val scoreSum = Bm25Terms
      .map(t => s"coalesce(sum(CASE WHEN term = '$t' THEN contrib END), 0)")
      .reduceLeft((a, b) => s"($a\n      + $b)")
    s"""WITH docs AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0) AS t
  FROM documents),
tot AS (
  SELECT count(*) AS n_docs, CAST(sum(len(t)) AS BIGINT) AS total_len FROM docs),
tf AS (
  SELECT doc_id, len, term, count(*) AS tf FROM (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS len, unnest(t) AS term FROM docs)
  WHERE term IN ($inList) GROUP BY 1, 2, 3),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT doc_id, tf.term,
    (((n_docs * 1.0 - df) + 0.5) / (df + 0.5)) *
      ((tf * 1.0) * ($Bm25K1 + 1)) /
      ((tf * 1.0) + $Bm25K1 * ((1 - $Bm25B) + $Bm25B * (((len * 1.0) * n_docs) / total_len))) AS contrib
  FROM tf JOIN df ON tf.term = df.term, tot)
SELECT doc_id, count(*) AS n_terms,
  round($scoreSum, 6) AS score
FROM sc GROUP BY 1
ORDER BY score DESC, doc_id LIMIT 20"""
  }

  override def oracles: Map[String, String] =
    oraclesBase + ("text_repetition" -> repetitionOracle) +
      ("text_langid" -> langidOracle) +
      ("text_script_mix" -> scriptMixOracle) +
      ("text_fingerprint" -> fingerprintOracle) +
      ("text_line_dedup" -> lineDedupOracle) +
      ("text_classifier_score" -> classifierOracle) +
      ("text_split_drift" -> splitDriftOracle) +
      ("text_bm25_topk" -> bm25Oracle) +
      ("text_classifier_sweep" -> classifierSweepOracle) +
      ("text_token_fertility" -> tokenFertilityOracle) +
      ("text_uncertainty_sample" -> uncertaintyOracle)
}
