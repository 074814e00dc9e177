package graft.streaming

import java.sql.Timestamp

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Stateless ingest-time curation guards: the streaming twins of the
  * batch `pipe_decontaminate` / `pipe_quality_funnel` stages, sharing
  * their column kernels (wordNgrams / qualityCounters) so a document
  * gets the same verdict whether it arrives in a backfill or on the
  * live stream.
  *
  * The tag guards are pure per-row maps — no watermark, no state
  * store, append-mode safe — which is exactly what an ingest edge
  * wants: the expensive corpus-level decisions (dedup, funnel
  * accounting) happen downstream in batch; the edge only TAGS, so
  * late data can never corrupt guard state. The one stateful member
  * is [[streamingLeakagePostings]] — an update-mode (source, gram)
  * postings count whose latest sink rows feed the batch leakage
  * matrix's pair board unchanged.
  *
  * The eval n-gram set rides a driver broadcast: benchmark suites are
  * MBs even when the training corpus is 100 TB, the same envelope as
  * any broadcast dimension (at larger eval sets, swap the Set for a
  * Bloom filter — the call shape is unchanged, FPs become possible).
  */
object StreamingGuards {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** Broadcastable membership index over an eval corpus's n-grams —
    * either the exact driver set or, past the size gate, a Bloom
    * filter (FPs possible, never FNs: a contaminated gram is ALWAYS
    * flagged; a rare clean gram may be over-flagged, the conservative
    * direction for decontamination). */
  sealed trait EvalGramIndex extends Serializable {
    def contains(g: String): Boolean
    /** distinct gram count of the eval corpus (both variants know it). */
    def size: Long
    def exact: Boolean
  }
  final case class ExactGrams(set: Set[String]) extends EvalGramIndex {
    def contains(g: String): Boolean = set.contains(g)
    def size: Long = set.size.toLong
    def exact: Boolean = true
  }
  final case class BloomGrams(bf: org.apache.spark.util.sketch.BloomFilter,
      size: Long) extends EvalGramIndex {
    def contains(g: String): Boolean = bf.mightContainString(g)
    def exact: Boolean = false
  }

  /** Build the eval-gram membership index, auto-routed by size: the
    * distinct grams are COUNTED first (a map-combined aggregate — no
    * driver materialization), then either collected into an exact set
    * (≤ `maxGrams`) or folded into a Bloom filter (distributed
    * aggregation; driver holds only the final bit array, ~2.4 bytes
    * per gram at fpp 1e-4 vs ~50+ bytes per collected string). r8 #3:
    * the old gate collected up to 50M strings — several GB on the
    * driver — BEFORE its require fired; now nothing bigger than the
    * gate ever reaches the driver, and oversize eval sets keep working
    * instead of crashing. */
  private def distinctGrams(evalDocs: DataFrame, n: Int): (DataFrame, Long) = {
    val pinned = graft.CacheRegistry.persistTracked(
      evalDocs
        // one-pass gram kernel (the docGrams O(tokens²)-pushdown fix)
        .select(explode(wordGramsDistinct(coalesce(col("text"), lit("")), n)).as("s"))
        .distinct())
    (pinned, pinned.count())
  }

  def evalGramIndex(evalDocs: DataFrame, n: Int = 5, maxGrams: Long = 5000000L,
      fpp: Double = 1e-4): EvalGramIndex = {
    val (pinned, nGrams) = distinctGrams(evalDocs, n)
    if (nGrams <= maxGrams)
      ExactGrams(pinned.collect().map(_.getString(0)).toSet)
    else
      BloomGrams(pinned.stat.bloomFilter("s", nGrams, fpp), nGrams)
  }

  /** Exact-set variant for callers that need real membership (default
    * gate 5M grams ≈ a few hundred MB of driver strings — an order
    * tighter than r8's 50M). Count-gated BEFORE any collect; an
    * oversize corpus fails loudly with the Bloom route named. */
  def evalGramSet(evalDocs: DataFrame, n: Int = 5, maxGrams: Long = 5000000L): Set[String] = {
    val (pinned, nGrams) = distinctGrams(evalDocs, n)
    // fail on the COUNT, before collecting anything — and without
    // building the Bloom filter evalGramIndex would route to (this
    // caller asked for exact membership; the build would be discarded)
    require(nGrams <= maxGrams,
      s"eval gram set holds $nGrams grams (> $maxGrams): too large for a " +
        "driver set — use evalGramIndex, which routes oversize corpora to a Bloom filter")
    pinned.collect().map(_.getString(0)).toSet
  }

  /** Tag each arriving document with its benchmark-overlap counts:
    * (n_grams, n_contaminated, clean). Same gram kernel as the batch
    * query; same counting rule (distinct grams, membership in the eval
    * index — exact or Bloom per the size route). */
  def decontaminationTag(docs: Dataset[Doc], evalGrams: Broadcast[EvalGramIndex], n: Int = 5): DataFrame = {
    val hits = udf { (gs: Seq[String]) =>
      val ev = evalGrams.value
      gs.count(ev.contains).toLong
    }
    docs.toDF()
      // null text is a data condition, not a crash (same rule as the
      // multimodal wrap): coalesce to empty -> zero grams -> clean.
      // One-pass gram kernel, see CurationQueries.docGrams.
      .withColumn("gs", wordGramsDistinct(coalesce(col("text"), lit("")), n))
      .select(col("doc_id"), col("ts"),
        size(col("gs")).cast("long").as("n_grams"),
        hits(col("gs")).as("n_contaminated"))
      .withColumn("clean", col("n_contaminated") === 0L)
  }

  /** Incremental cross-source gram-postings index — the streaming twin
    * of batch `pipe_leakage_matrix`'s (source, gram-hash) core (the
    * one guard here that IS stateful — an update-mode count, not a
    * per-row tag): per arriving document, its DISTINCT 5-gram hashes
    * (PolyHash64 computed INSIDE the row — gram text never leaves the
    * map side, the batch invariant) emit (source, h) pairs, and the
    * keyed count maintains the postings across micro-batches. The
    * sink's latest row per key IS the batch `sg` relation (presence =
    * any count ≥ 1), independent of how documents split across
    * batches; feeding the SAME df-guarded wedge join over the postings
    * reproduces the batch leakage matrix exactly — EventStreamsSpec
    * pins a ≥3-split run against the batch query. State is one long
    * per live (source, gram) key; at 100 TB the store is RocksDB and
    * the key space is the distinct-gram census, the same envelope as
    * the span-postings twin (StreamingDedup.streamingSpanPostings). */
  def streamingLeakagePostings(docs: DataFrame, n: Int = 5): DataFrame =
    docs
      // one-pass gram kernel (the docGrams O(tokens²)-pushdown fix)
      .select(col("source"), explode(wordGramsDistinct(col("text"), n)).as("g"))
      .select(col("source"), graft.functions.PolyHash64Expr(col("g")).as("h"))
      .groupBy("source", "h")
      .agg(count(lit(1)).as("occurrences"))

  /** Broadcastable eval-side index for [[fuzzyDecontTag]] — the fuzzy
    * containment pass's analogue of [[EvalVecIndex]]: per surviving
    * eval shingle hash, the eval docs containing it (`postings`), plus
    * each eval doc's surviving distinct-shingle count (`nEval`, the
    * containment denominator). "Surviving" = after the SAME eval-df
    * cap as batch `pipe_decontaminate_fuzzy`: a shingle in more than
    * `dfCap` eval docs is boilerplate and is dropped from the UNIVERSE
    * (postings AND denominator), so stream and batch compute identical
    * containments by construction. An eval doc whose shingles are all
    * capped away simply has no postings — exactly the batch pass,
    * where it leaves the `sh` relation and can never pair. */
  final case class EvalShingleIndex(postings: Map[Long, Array[Long]],
      nEval: Map[Long, Long]) extends Serializable

  /** Build the eval shingle index — driver-side and count-gated BEFORE
    * the collect (the evalGramSet discipline): benchmark suites are
    * MBs when the corpus is 100 TB, and the index rows are 16-byte
    * (eval_id, hash) pairs, so the default gate (the shared 5M figure)
    * bounds the driver at ~80 MB. An eval side bigger than the gate is
    * a misconfiguration; the batch pass (whose eval index shuffle-
    * routes past its own gate) is the right tool for it. */
  def evalShingleIndex(evalDocs: DataFrame,
      dfCap: Long = graft.queries.CurationQueries.fuzzyEvalDfCap,
      maxRows: Long = 5000000L): EvalShingleIndex = {
    import graft.functions.HashFunctions.wordShingleHashes
    val ex = evalDocs
      .select(col("doc_id").as("eval_id"),
        wordShingleHashes(coalesce(col("text"), lit("")), 3).as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("eval_id"), explode(col("hs")).as("h"))
    // pinned: the capped index feeds the gate count AND the collect
    val capped = graft.CacheRegistry.persistTracked(
      if (dfCap <= 0) ex
      else ex.join(
        ex.groupBy("h").agg(count(lit(1)).as("edf"))
          .where(col("edf") <= dfCap).select("h"),
        Seq("h"), "left_semi"))
    val n = capped.count()
    // fail on the COUNT, before collecting anything
    require(n <= maxRows,
      s"eval shingle index holds $n rows (> $maxRows): too large for a driver " +
        "broadcast — run the batch pipe_decontaminate_fuzzy, whose eval index " +
        "shuffle-routes past its broadcast gate")
    val rows = capped.select("eval_id", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    EvalShingleIndex(
      rows.groupBy(_._2).map { case (h, vs) => h -> vs.map(_._1).toArray },
      rows.groupBy(_._1).map { case (e, vs) => e -> vs.length.toLong })
  }

  /** Tag each arriving document with its fuzzy benchmark overlap — the
    * streaming twin of batch `pipe_decontaminate_fuzzy`, completing
    * the trilogy's ingest edge (exact → [[decontaminationTag]],
    * semantic → [[semanticDecontTag]]): same shingle kernel
    * (wordShingleHashes — the doc's DISTINCT word-3-gram hashes), same
    * eval-df-capped universe (pre-applied in the index), same
    * containment rule (shared shingles / eval doc's surviving count,
    * round-6, ≥ threshold). Output per doc: how many eval docs it
    * contaminates (`n_flagged`), the max containment over
    * THRESHOLD-CLEARED evals (`best_containment`, null when clean —
    * reconciles exactly with batch max(containment) per train doc,
    * the best_sim discipline), and `clean`. Stateless map-side tag;
    * corpus-level accounting stays in batch. */
  def fuzzyDecontTag(docs: Dataset[Doc], idx: Broadcast[EvalShingleIndex],
      threshold: Double = graft.queries.CurationQueries.FuzzyThreshold): DataFrame = {
    import graft.functions.HashFunctions.wordShingleHashes
    val tag = udf { (hs: Seq[Long]) =>
      val ix = idx.value
      val counts = scala.collection.mutable.HashMap.empty[Long, Long]
      hs.foreach { h =>
        ix.postings.get(h).foreach(_.foreach { e =>
          counts.update(e, counts.getOrElse(e, 0L) + 1L)
        })
      }
      var flagged = 0L
      var best = Double.NegativeInfinity
      counts.foreach { case (e, c) =>
        // nEval(e) ≥ 1 by construction: postings exist only for rows
        // that survived the cap, and those same rows are the count
        val cont = BigDecimal(c.toDouble / ix.nEval(e))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (cont >= threshold) {
          flagged += 1
          if (cont > best) best = cont
        }
      }
      (flagged, if (flagged > 0) Some(best) else None)
    }
    docs.toDF()
      // null text is a data condition, not a crash: empty -> no
      // shingles -> clean (the decontaminationTag rule)
      .withColumn("hs", wordShingleHashes(coalesce(col("text"), lit("")), 3))
      .withColumn("t", tag(col("hs")))
      .select(col("doc_id"), col("ts"),
        size(col("hs")).cast("long").as("n_shingles"),
        col("t._1").as("n_flagged"),
        col("t._2").as("best_containment"),
        (col("t._1") === 0L).as("clean"))
  }

  case class Vec(vec_id: Long, ts: Timestamp, embedding: Array[Float])

  /** Broadcastable eval-side index for [[semanticDecontTag]]: the eval
    * vectors keyed by every bucket within hamming≤2 of their own SRP
    * sign bucket — so a train vector's single map-side bucket lookup
    * reproduces exactly the batch pipe_decontaminate_semantic
    * candidate rule (train ∈ probe(eval) ⟺ hamming(eval, train) ≤ 2 ⟺
    * eval ∈ probe(train)). `bits` is pinned at build time
    * (DedupQueries.semBitsFor(corpus size) — a stream cannot re-count
    * the corpus per row; size the quantizer for the corpus the batch
    * twin sees and the two bucket identically by construction). */
  final case class EvalVecIndex(bits: Int,
      byBucket: Map[Long, Array[(Long, Array[Float])]]) extends Serializable

  /** Build the eval vector index — driver-side and count-gated BEFORE
    * the collect (the evalGramSet discipline): benchmark suites are
    * thousands of vectors when the corpus is 100 TB; an eval side
    * bigger than the gate is a misconfiguration, and the batch query
    * (whose bucket equi-join shuffle-routes past its gate) is the
    * right tool for it. */
  def evalVecIndex(evalVecs: DataFrame, bits: Int, maxVecs: Long = 100000L): EvalVecIndex = {
    import graft.functions.VectorFunctions.signBucketScalar
    import graft.queries.DedupQueries.{semCoeffs, DecontMasks, Dim}
    // fail at the API boundary, not with an opaque AIOOBE inside the
    // coefficient loop: the committed plane table has SemMaxBits rows
    require(bits >= graft.queries.DedupQueries.SemMinBits &&
        bits <= graft.queries.DedupQueries.SemMaxBits,
      s"bits=$bits outside the committed SRP plane range " +
        s"[${graft.queries.DedupQueries.SemMinBits}, ${graft.queries.DedupQueries.SemMaxBits}] " +
        "— derive it with DedupQueries.semBitsFor(corpus size)")
    val n = evalVecs.count()
    require(n <= maxVecs,
      s"eval vector index holds $n vectors (> $maxVecs): too large for a driver " +
        "broadcast — run the batch pipe_decontaminate_semantic, whose bucket " +
        "equi-join shuffle-routes past its gate")
    val rows = evalVecs.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expanded = rows.flatMap { case (id, v) =>
      val b = signBucketScalar(v, bits, semCoeffs, Dim)
      DecontMasks.iterator.filter(_ < (1L << bits)).map(m => (b ^ m) -> ((id, v)))
    }
    EvalVecIndex(bits, expanded.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) })
  }

  /** Tag each arriving vector with its semantic benchmark overlap —
    * the streaming twin of batch `pipe_decontaminate_semantic`, same
    * quantizer (signBucketScalar over the committed integer SRP
    * coefficients), same hamming≤2 candidate rule (pre-expanded into
    * the index), same exact-cosine threshold (cosineScalar — the
    * batch query's cosineLoop kernel). `best_sim` is the max round-6
    * cosine over candidates that CLEARED the threshold (null when
    * none did) — exactly the batch query's `max(sim) GROUP BY
    * train_id`, so stream and batch reconcile row-for-row on all
    * three outputs, not just the counts. Stateless map-side tag: the
    * edge only TAGS, like [[decontaminationTag]]; dedup/accounting
    * stay in batch where late data cannot corrupt them. */
  def semanticDecontTag(vecs: Dataset[Vec], idx: Broadcast[EvalVecIndex],
      threshold: Double = graft.queries.DedupQueries.CosineThreshold): DataFrame = {
    import graft.functions.VectorFunctions.{cosineScalar, signBucketScalar}
    import graft.queries.DedupQueries.{semCoeffs, Dim}
    val tag = udf { (v: Array[Float]) =>
      val ix = idx.value
      val cands = ix.byBucket.getOrElse(
        signBucketScalar(v, ix.bits, semCoeffs, Dim),
        Array.empty[(Long, Array[Float])])
      var hits = 0L
      var best = Double.NegativeInfinity
      cands.foreach { case (_, ev) =>
        // eval first — the batch query's cosineLoop(evec, train) order
        val c = cosineScalar(ev, v, Dim)
        // a zero vector cosines to NaN; the batch query EXCLUDES NaN
        // explicitly (Spark SQL orders NaN above every number, so a
        // bare `>= threshold` would pass it) — mirror the exclusion
        // here, where BigDecimal(NaN) would also crash the stream
        if (!c.isNaN) {
          val s = BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          // best_sim tracks only candidates that CLEARED the threshold
          // (r11 ADVICE): the batch twin never surfaces sub-threshold
          // sims, so a consumer reconciling stream best_sim against
          // batch max(sim) per train vector must see the same value —
          // clean rows carry NULL, matching the batch query's absence
          if (s >= threshold) {
            hits += 1
            if (s > best) best = s
          }
        }
      }
      (hits, if (hits > 0) Some(best) else None)
    }
    vecs.toDF()
      .withColumn("t", tag(col("embedding")))
      .select(col("vec_id"), col("ts"),
        col("t._1").as("n_contaminated"),
        col("t._2").as("best_sim"),
        (col("t._1") === 0L).as("clean"))
  }

  /** Tag each arriving document with the batch quality gate's verdict
    * (same `qualityCounters` kernel and thresholds as
    * `pipe_text_corpus`'s gate): token/stopword counts plus an accept
    * flag. */
  def qualityTag(docs: Dataset[Doc], minToks: Int = 10): DataFrame =
    docs.toDF()
      .withColumn("q", qualityCounters(col("text")))
      .select(col("doc_id"), col("ts"),
        col("q.n_toks").cast("long").as("n_toks"),
        col("q.n_stop").cast("long").as("n_stop"),
        (col("q.n_stop") > 0 && col("q.n_toks") >= minToks).as("accept"))
}
