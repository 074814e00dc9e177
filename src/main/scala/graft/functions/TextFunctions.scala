package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (pure `functions._` compositions — all
  * codegen'd, no UDFs, so they stay inside WholeStageCodegen and scale
  * linearly with input splits).
  *
  * Mirrors the reference's normalization layer
  * (/root/reference/src/scipi/src/main/java/stream/ScipiStream.java:218-257)
  * plus the LLM-training-data text ops (language id, quality scoring,
  * token stats, fingerprinting).
  */
object TextFunctions {

  /** validateStr (ScipiStream.java:218-230): strip non-alphanumeric,
    * trim, lowercase, empty → null. Trim is regex `^\s+|\s+$`, NOT
    * Spark's `trim()`: the reference uses Java String.trim (strips all
    * chars <= 0x20) while Spark's trim strips only 0x20 spaces — a
    * leading tab would survive and break idempotence (caught by the
    * property spec). */
  def normalizeStr(c: Column): Column =
    nullif(lower(regexp_replace(
      regexp_replace(c, s"[^a-zA-Z0-9${UnicodeText.WsClass}]", ""),
      s"^${UnicodeText.WsPlus}|${UnicodeText.WsPlus}$$", "")), lit(""))

  /** validateTopics (ScipiStream.java:233-257): per-element normalize,
    * drop nulls and elements longer than 30 chars, dedup. */
  def normalizeTopics(arr: Column): Column =
    array_distinct(
      filter(transform(arr, normalizeStr _), x => x.isNotNull && length(x) <= 30))

  /** Whitespace tokenizer: lowercase, split on runs of whitespace,
    * drop empties. ONE primitive UDF, not the declarative
    * `filter(split(lower(text)))` chain (bit-identical output,
    * null-in/null-out included): the optimizer substitutes a computed
    * token column's definition into every filter it pushes below the
    * materializing Project (InferFiltersFromGenerate +
    * PushDownPredicates), and the declarative form put an INTERPRETED
    * higher-order lambda plus a second tokenize pass into eight
    * queries' scan Filters (r13, found by PushdownQuadraticAuditSpec —
    * the linear-cost cousins of the r12 O(tokens²) gram defect). As a
    * ScalaUDF every planner copy is one O(tokens) pass and the
    * enclosing stage keeps whole-stage codegen. */
  val tokens: Column => Column = {
    val f = udf { (t: String) =>
      if (t == null) null
      else UnicodeText.wsTokens(UnicodeText.simpleLower(t))
    }
    (text: Column) => f(text)
  }

  /** Strided fixed-width windows over a token-array column (by NAME, so
    * the generated SQL stays one codegen'd expression): windows start
    * at multiples of `stride` and take `width` tokens, the trailing
    * ones running short. stride == width gives disjoint segments
    * (text_line_dedup's line unit); stride < width gives overlapping
    * chunks (pipe_chunk_overlap). One shared generator so the
    * ceil-division and 1-based-slice conventions cannot drift between
    * the two call sites. Requires size(col) ≥ 1. */
  def stridedWindows(tokenCol: String, stride: Int, width: Int): Column =
    expr(s"transform(sequence(0, (size($tokenCol)+${stride - 1}) div $stride - 1), " +
      s"i -> slice($tokenCol, i*$stride+1, $width))")

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Sub-word count under the REAL committed BPE merge table
    * ([[BpeMerges.Rules]], 200 trained rules): letter runs lowercase
    * and merge rule-by-rule; digit runs and individual punctuation
    * marks count one unit each (the byte-pair pre-tokenizer split,
    * unchanged — those two terms stay pure-column so the \s semantics
    * match the oracle exactly as before). The DuckDB oracle replays
    * the identical merge chain via [[BpeMerges.oracleChain]]. */
  def subwordCount(text: Column): Column =
    bpeLetterUnits(text) +
      size(regexp_extract_all(text, lit("[0-9]+"), lit(0))) +
      length(regexp_replace(text, s"[a-zA-Z0-9${UnicodeText.WsClass}]", ""))

  /** Σ over letter runs of their BPE unit count. A UDF: the 200-rule
    * merge loop has no Catalyst-expression form (a 200-deep replace
    * chain falls out of codegen); the kernel is a tight per-run array
    * pass, the same justified-kernel tier as the shingle hasher.
    *
    * Runs are [a-z]+ over the SIMPLE-LOWERED text — the oracle's exact
    * order of operations (`lower(col)` then `[^a-z]+` → space in
    * BpeMerges.oracleCtes). Extracting [a-zA-Z]+ runs from the RAW text
    * and lowering each run afterward is NOT equivalent on unicode: a
    * code point whose simple lowercase is an ASCII letter (İ → i)
    * joins the oracle's run but splits the raw-text run ('İTHACA':
    * oracle run "ithaca", raw-run form "thaca" — different merge
    * counts). Identical on ASCII, where casing commutes with the run
    * boundary. */
  private val bpeLetterUnits = {
    val runPattern = java.util.regex.Pattern.compile("[a-z]+")
    udf { (t: String) =>
      if (t == null) null.asInstanceOf[java.lang.Integer]
      else {
        var n = 0
        val m = runPattern.matcher(UnicodeText.simpleLower(t))
        while (m.find())
          n += BpeMerges.countSubwords(m.group)
        Integer.valueOf(n)
      }
    }
  }

  /** Character n-grams of a string as an array column (used by the
    * shingle/fingerprint family). */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Word n-grams (shingles) from a token array.
    *
    * SCALE WARNING (r12 giant-doc probe): this is a higher-order
    * expression whose lambda references `toks` per gram position. If a
    * caller's token array is a COMPUTED column, the optimizer can
    * substitute that computation back into every reference when it
    * pushes an inferred filter below the materializing Project
    * (InferFiltersFromGenerate + PushDownPredicates) — the lambda then
    * re-tokenizes the document once PER GRAM, O(tokens²) per row in
    * interpreted eval (a 2M-token doc ground one task for >15 min;
    * normal docs never notice). Callers that explode the result over
    * document-scale text must use [[wordGramsDistinct]] instead — a
    * self-contained one-pass kernel that stays O(n) no matter how many
    * times the planner copies it. This form remains for
    * bounded-length inputs (names, titles) and as the semantic
    * reference the UDF is spec-pinned against. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Distinct word-n-gram STRINGS of a text in one primitive pass —
    * semantically identical to
    * `array_distinct(wordNgrams(tokens(text), n))` (lowercase,
    * whitespace-split, empties dropped, grams joined with one space,
    * first-occurrence order) but immune to the quadratic
    * pushdown-substitution class documented on [[wordNgrams]]: the
    * whole pipeline is ONE deterministic UDF, so every copy the
    * planner makes of it (pushed filters, duplicated projections)
    * costs a single O(tokens) pass. The string-gram sibling of
    * [[graft.functions.HashFunctions.wordShingleHashes]], for
    * consumers whose oracle compares gram TEXT. */
  def wordGramsDistinct(text: Column, n: Int): Column = {
    val f = udf { (t: String) =>
      if (t == null) Array.empty[String]
      else {
        val toks = UnicodeText.wsTokens(UnicodeText.simpleLower(t))
        if (toks.length < n) Array.empty[String]
        else {
          val seen = new java.util.LinkedHashSet[String](toks.length * 2)
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i <= toks.length - n) {
            sb.setLength(0)
            var g = 0
            while (g < n) {
              if (g > 0) sb.append(' ')
              sb.append(toks(i + g))
              g += 1
            }
            seen.add(sb.toString)
            i += 1
          }
          val arr = new Array[String](seen.size)
          seen.toArray(arr)
          arr
        }
      }
    }
    f(text)
  }

  /** Stopword ratio against a small built-in english list. */
  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** The stopword list as a SQL IN-list, for oracle strings — ONE source
    * of truth, so editing [[stopwords]] can never silently desync an
    * oracle from the kernel the Spark side runs. */
  val stopwordsSqlList: String =
    stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
        .cast("double") / size(toks))
  }

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, s"[^a-zA-Z0-9${UnicodeText.WsClass}]", "")))
        .cast("double") / length(text))

  /** Mean token length — long-token gibberish shows up here. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  /** Composite quality score in [0,1]: length band + low punctuation +
    * reasonable mean token length. Heuristic, deterministic. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore * 0.4 + punct * 0.3 + mtlScore * 0.3), 6)
  }

  /** Language id over a closed candidate set via stop-token evidence.
    * N-gram/stop-token heuristic (no external model): picks the language
    * whose marker tokens occur most; falls back to 'und'. */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(
        size(filter(toks, t => t.isin(ms.map(x => x: Any): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** 64-bit document fingerprint: hash of the normalized token stream
    * (order-sensitive; same fingerprint ⇔ same normalized content).
    * [[PolyHash64Expr]] (codegen'd wrapping poly-31) rather than
    * xxhash64 so the value is reproducible in the DuckDB oracle's
    * HUGEINT arithmetic — hard value check instead of rows-only. */
  def fingerprint(text: Column): Column =
    PolyHash64Expr(concat_ws("\u0001", tokens(text)))

  /** Within-document repetition: 1 - distinct_tokens/total_tokens
    * (templated/spammy text scores high). */
  def repetitionRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** PII-style pattern redaction: replace matches with a fixed token.
    * Default patterns: emails and long digit runs (ids/phones). */
  def redact(text: Column, patterns: Seq[String] = DefaultPiiPatterns,
      replacement: String = "[REDACTED]"): Column =
    patterns.foldLeft(text)((c, p) => regexp_replace(c, p, replacement))

  val DefaultPiiPatterns: Seq[String] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "\\d{7,}")

  /** One-pass quality counters (chars, alnum-or-space chars, tokens,
    * stopword tokens, summed token length) as a single UDF: the ratio
    * queries derive punct/stopword/mean-token-len from these five ints
    * with the division+round done in SQL, so results stay bit-identical
    * to the pure-column formulation while replacing four interpreted
    * array traversals per row. Char counts are CODE POINTS (what
    * `length()` means on both engines — a UTF-16 `String.length` counts
    * an emoji as 2 where the oracle counts 1; r13 unicode axis), and
    * casing is the [[UnicodeText.simpleLower]] contract. */
  def qualityCounters(text: Column): Column = {
    val stop = stopwords.toSet
    val f = udf { (t: String) =>
      if (t == null) (0, 0, 0, 0, 0L)
      else {
        var kept = 0
        var i = 0
        while (i < t.length) {
          val c = t.charAt(i)
          // exactly the [[UnicodeText.WsClass]] contract (RE2's \s) —
          // NOT Java-regex \s, whose extra U+000B membership diverged
          // from every oracle's regexp_replace([^a-zA-Z0-9\s])
          if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || UnicodeText.isWs(c)) kept += 1
          i += 1
        }
        val toks = UnicodeText.wsTokens(UnicodeText.simpleLower(t))
        var sumLen = 0L
        var nStop = 0
        toks.foreach { w =>
          sumLen += UnicodeText.codePoints(w); if (stop(w)) nStop += 1
        }
        (UnicodeText.codePoints(t), kept, toks.length, nStop, sumLen)
      }
    }
    f(text).cast("struct<n_chars:int,n_kept:int,n_toks:int,n_stop:int,sum_tok_len:bigint>")
  }
}
