package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.HashFunctions._
import graft.functions.VectorFunctions._

/** Deduplication query surface over `documents` / `embeddings`:
  * exact (hash-groupBy), exact n-gram Jaccard + containment,
  * MinHash+LSH, SimHash, embedding-cosine near-dup, and
  * connected-component clustering of the pair graph.
  *
  * Scale notes (100 TB):
  *  - Exact dedup groups on a 64-bit content hash, not the text — the
  *    shuffle carries 8-byte keys + doc_ids, never documents.
  *  - The exact-Jaccard path joins on shingle *hashes* (8 bytes) and
  *    computes |A∩B| by counting shared shingles — O(Σ per-shingle
  *    bucket²) like any inverted-index join; the df cap bounds the
  *    worst bucket and AQE skew-split covers the rest. Full shingle
  *    arrays never shuffle: the hot remainder completes via tiny
  *    per-doc hot arrays.
  *  - MinHash+LSH is the scale path: candidates come from 16-band
  *    signature buckets (detect prob 1-(1-j⁴)¹⁶ ≈ 0.9998 at j=0.8), and
  *    only candidates pay the exact-verify cost. The verify keeps output
  *    equal to the brute-force oracle w.h.p. — same DuckDB oracle as the
  *    exact query.
  *  - SimHash pairs come from 4-chunk hamming banding (hamming ≤ 3 ⇒
  *    some chunk equal) — no O(n²) anywhere.
  */
object DedupQueries extends QueryPack {

  private val JaccardThreshold = 0.8
  private val ContainmentThreshold = 0.9
  private[graft] val CosineThreshold = 0.4
  private[graft] val Dim = 64

  /** Adaptive bit-count policy of dedup_semantic's SRP coarse
    * quantizer (the learned tier's caps-table discipline at target
    * occupancy 64, the old scheme's expected cluster size): B =
    * smallest b in [SemMinBits, SemMaxBits] with 2^b·64 ≥ N —
    * integer-only selection on both engines. */
  private[graft] val SemOcc = 64L
  private[graft] val SemMinBits = 3
  private[graft] val SemMaxBits = 16
  private[graft] val semCaps: Seq[(Long, Long)] =
    (SemMinBits to SemMaxBits).map(b => (b.toLong, (1L << b) * SemOcc))

  /** The caps-table bit selection as a plain function — the streaming
    * semantic-decontamination tag pins its quantizer width at index
    * build time with THIS policy so a stream sized for the batch
    * corpus buckets identically to the batch query. */
  private[graft] def semBitsFor(n: Long): Int =
    semCaps.find(_._2 >= n).map(_._1.toInt).getOrElse(SemMaxBits)

  /** Centroid candidates per bucket — bounds assignment at O(N·C). */
  private[graft] val CentsPerBucket = 4

  /** Committed integer SRP coefficients, one row per plane (16×64) —
    * interpolated into the oracle term-by-term. */
  private[graft] val semCoeffs: Array[Array[Long]] =
    srpIntCoeffs(SemMaxBits, Dim)

  /** The adaptive-B selection as a 1-row relation — shared by
    * dedup_semantic's bucketing stage and the semantic decon screen's
    * mask filter (one definition, no drift). */
  private[graft] def semBsel(s: SparkSession, d: String): DataFrame =
    semBselFor(s, Tables.embeddings(s, d))

  /** Same caps-table selection over an arbitrary base relation —
    * dedup_semantic_incremental sizes its quantizer from the HISTORY
    * side only (the persisted index's width is fixed when the index is
    * built; an arriving batch buckets with the index's width, never
    * its own — the semanticDecontTag policy, here in-plan). */
  private[graft] def semBselFor(s: SparkSession, base: DataFrame): DataFrame = {
    import s.implicits._
    semCaps.toDF("bbits", "cap")
      .crossJoin(base.agg(count(lit(1)).as("n")))
      .where(col("cap") >= col("n"))
      .agg(coalesce(min("bbits"), lit(SemMaxBits.toLong)).as("bbits"))
  }

  /** Bucketing stage of dedup_semantic, UNCACHED (the query persists
    * it; PlanInvariantsSpec plans it bare so the one 1-row scalar
    * nested-loop is exactly countable — the erMatchPairs discipline):
    * adaptive B from the caps table, then the map-side sign bucket. */
  private[graft] def semBucketed(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(semBsel(s, d)))
      .select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), col("bbits"), semCoeffs, Dim).as("bucket"))

  /** Assignment stage of dedup_semantic: per-bucket centroid
    * candidates (first CentsPerBucket by vec_id) → nearest by
    * (round-6 cosine desc, cluster asc) via a bucket equi-join. */
  private[graft] def semAssign(bucketed: DataFrame): DataFrame = {
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("vec_id").asc)
    val cents = bucketed
      .withColumn("crn", row_number().over(byId))
      .where(col("crn") <= CentsPerBucket)
      .select(col("bucket"), col("vec_id").as("cluster"), col("embedding").as("cvec"))
    val bySim = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("sim").desc, col("cluster").asc)
    // cosineLoop, not cosineExpr: under ANSI mode (the Spark 4 default)
    // the SQL division 0/0 THROWS on a zero vector, while the loop
    // kernel yields IEEE NaN — which both engines then rank ABOVE every
    // real sim, deterministically (tie → lowest cluster), so a zero
    // vector assigns identically in Spark and DuckDB instead of
    // crashing one engine (NanOrderingAuditSpec's planted fixture)
    bucketed.join(cents, Seq("bucket"))
      .select(col("vec_id"), col("cluster"), col("embedding"),
        round(cosineLoop(col("embedding"), col("cvec"), Dim), 6).as("sim"))
      .withColumn("rn", row_number().over(bySim))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** Per-cluster member cap for the intra-cluster pair stage: members
    * ranked past the cap (by vec_id) never generate candidate pairs,
    * so an adversarial corpus that piles mass into one cluster stays
    * O(cap²) instead of quadratic — they still appear in the output
    * census with is_dup decided by the capped prefix. ~10× the
    * expected cluster size (64/C ≈ 16), so it never binds on an
    * honest corpus (both driver SFs stay hash-identical with the cap
    * off). `SPARK_GRAFT_SEM_CLUSTER_CAP` overrides (0 disables — the
    * soak A/B arm). */
  private[graft] def semClusterCap: Long =
    sys.env.get("SPARK_GRAFT_SEM_CLUSTER_CAP").map(_.toLong).getOrElse(256L)

  /** Lloyd iteration count for dedup_semantic_kmeans' trained
    * centroids — interpolated into the oracle (the CTE chain is
    * generated from the SAME value, so both engines run identical
    * refinement depth). 2 passes close most of the within-cluster
    * tightening on SRP-bucketed corpora; the iteration cost is linear
    * per pass, so the knob trades wall for quality, not asymptotics.
    * `SPARK_GRAFT_SEM_KMEANS_ITERS` overrides (0 = seeds only, the
    * A/B arm that degenerates to centroid-cosine over the heuristic
    * seeds). */
  private[graft] def semKMeansIters: Int =
    sys.env.get("SPARK_GRAFT_SEM_KMEANS_ITERS").map(_.toInt).getOrElse(2)

  /** Per-bucket TRAINING membership cap for dedup_semantic_kmeans
    * (first cap members by vec_id — the semClusterCap discipline on
    * the update side): an adversarial corpus piling mass into one
    * bucket bounds each Lloyd update's per-group state at O(cap) while
    * ASSIGNMENT still covers every vector. ~4× the expected bucket
    * occupancy (64), invisible on honest corpora; interpolated into
    * the oracle. `SPARK_GRAFT_SEM_TRAIN_CAP` overrides (0 disables —
    * the soak A/B arm). */
  private[graft] def semTrainCap: Long =
    sys.env.get("SPARK_GRAFT_SEM_TRAIN_CAP").map(_.toLong).getOrElse(256L)

  /** Per-(bucket, side) BUILD membership cap for
    * dedup_semantic_incremental (first cap by vec_id): the probe side
    * (the arriving batch) is never capped, so incremental cost is
    * O(batch · 2·cap) in the worst bucket — linear in the batch even
    * when an adversarial corpus piles mass into one bucket. ~4× the
    * expected bucket occupancy (64), invisible on honest corpora
    * (both driver SFs hash-identical with the cap off); interpolated
    * into the oracle; DedupQualitySpec plants a 300-identical-history
    * corpus pinning exactly cap pairs. `SPARK_GRAFT_SEM_INCR_CAP`
    * overrides (0 disables — the soak A/B arm). */
  private[graft] def semIncrCap: Long =
    sys.env.get("SPARK_GRAFT_SEM_INCR_CAP").map(_.toLong).getOrElse(256L)

  /** XOR masks of the semantic decontamination screen's hamming≤2
    * multiprobe: every mask with ≤2 bits set over the max plane count
    * (137 at 16 planes); the plan filters to mask < 2^B against the
    * adaptive-B scalar. Probing radius 2 mirrors [[SimilarityQueries]]
    * srpTopK — per-table recall for a near-copy pair (cosine ≥0.95,
    * per-bit disagreement ≈0.1) stays ≈0.8 even at B=16, while the
    * probed fraction of buckets, (1+B+B(B-1)/2)/2^B, falls from 7/8 at
    * B=3 to 0.2% at B=16 — the screen gets CHEAPER per pair as the
    * corpus grows. */
  private[graft] val DecontMasks: Seq[Long] =
    (0 until (1 << SemMaxBits)).filter(m => Integer.bitCount(m) <= 2).map(_.toLong)

  /** Gate-injectable core of pipe_decontaminate_semantic (env is
    * immutable in a test JVM — DedupQualitySpec drives the shuffle arm
    * with an explicit gate, the decontaminateGate discipline). */
  private[graft] def decontaminateSemanticGate(
      s: SparkSession, d: String,
      gate: Long = graft.queries.CurationQueries.evalBroadcastGate): DataFrame = {
    import s.implicits._
    val b = graft.CacheRegistry.persistTracked(semBucketed(s, d))
    val isEval = pmod(col("vec_id"), lit(50)) === 0
    // eval probe index: each eval vector × every in-range hamming≤2
    // mask — benchmark-sized × ≤137, still a dimension table. A given
    // (eval, train) pair matches at most ONE mask (the XOR of their
    // buckets), so the candidate join never duplicates pairs. Masks
    // ride a 137-row broadcast, not an exploded literal array — the
    // unrolled form pushed the generated processNext() past janino's
    // 64 KB method limit (the signBucket-UDF lesson) and cost the
    // whole stage its codegen. The probe carries ONLY
    // (eval_id, pbucket) — 16 bytes/row, the width the shared 5M-row
    // gate is calibrated for; the eval VECTORS ride a separate
    // mask-free relation joined back after the bucket cut, so the
    // ≤137× probe expansion never multiplies 256-byte embeddings.
    // Pinned before the gate count (the decontaminateFuzzyCap
    // discipline: the count and the join share one materialization).
    val masks = DecontMasks.toDF("m")
    val probe = graft.CacheRegistry.persistTracked(
      b.where(isEval)
        .select(col("vec_id").as("eval_id"), col("bucket"))
        .crossJoin(broadcast(semBsel(s, d)))
        .crossJoin(broadcast(masks))
        .where(col("m") < expr("shiftleft(CAST(1 AS BIGINT), CAST(bbits AS INT))"))
        .select(col("eval_id"),
          col("bucket").bitwiseXOR(col("m")).as("pbucket")))
    val evalVecs = b.where(isEval)
      .select(col("vec_id").as("eval_id"), col("embedding").as("evec"))
    // the decontaminateGate discipline — ONE gate decision covers both
    // eval-side relations (the vector table has strictly fewer rows
    // than the probe): broadcast while benchmark-sized; past the gate
    // both equi-joins shuffle-route with identical rows
    val route = graft.queries.CurationQueries.routeIf(
      graft.queries.CurationQueries.gateBroadcastable(probe, gate)) _
    b.where(!isEval)
      .select(col("vec_id").as("train_id"), col("embedding"), col("bucket"))
      .join(route(probe.toDF()), col("bucket") === col("pbucket"))
      .join(route(evalVecs), Seq("eval_id"))
      // cosineLoop, not cosineExpr: the pushed-down threshold filter
      // duplicates the projection, and 2×192 unrolled terms plus the
      // join stage breach janino's 64 KB limit (observed: the stage
      // lost codegen entirely)
      .select(col("eval_id"), col("train_id"),
        round(cosineLoop(col("evec"), col("embedding"), Dim), 6).as("sim"))
      // NaN is excluded EXPLICITLY, not left to the comparison: Spark
      // SQL orders NaN greater than every number, so a zero vector's
      // 0/0 cosine would otherwise pass the threshold and flag as
      // contaminating every eval doc in its probe range (caught by the
      // planted zero-vector fixture). Mirrored in the oracle so the
      // exclusion never depends on either engine's NaN ordering.
      .where(!isnan(col("sim")) && col("sim") >= CosineThreshold)
  }

  /** (doc_id, hs: distinct word-3-gram shingle hashes) for docs with
    * >= 3 tokens. */
  private def docShingleHashes(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), wordShingleHashes(col("text"), 3).as("hs"))
      .where(size(col("hs")) > 0)

  private def jaccard(common: Column, na: Column, nb: Column): Column =
    round(common.cast("double") / (na + nb - common), 6)

  /** Hot-shingle document-frequency cap for the inverted-index family.
    * A shingle appearing in more than `ShingleDfCap` documents (a
    * stopword phrase — "the the the") contributes O(df²) candidate
    * pairs but never *decides* Jaccard at 0.8, because near-dup pairs
    * share many discriminative shingles too. Capped shingles are
    * dropped from the CANDIDATE index only; `c` still counts the FULL
    * intersection (cold aggregate + hot completion join), so any pair
    * that shares at least one sub-cap shingle gets its exact Jaccard
    * — on this
    * corpus that is every near-dup pair (the DuckDB brute-force oracle
    * stays hash-green), and at 100 TB it is the knob that turns the
    * worst bucket from quadratic to bounded. AQE skew-split remains the
    * second line of defense for buckets under the cap.
    * `SPARK_GRAFT_SHINGLE_DF_CAP` overrides (0 disables — used by the
    * Soak A/B to measure the curve with and without the cap). */
  private def shingleDfCap: Long =
    sys.env.get("SPARK_GRAFT_SHINGLE_DF_CAP").map(_.toLong).getOrElse(1000L)

  /** Shared pair-derivation core for the exact Jaccard / containment /
    * clustering family: candidate pairs (i < j) with shared-shingle
    * count `c` and the two set sizes `na`/`nb`.
    *
    * Shape (r8 rework — the r7 verify joined the FULL shingle arrays of
    * every candidate twice, the battery's slowest row):
    *  1. The inverted index rows carry the doc's set size, so sizes are
    *     known AT candidate generation — `sizeRatio` (the Jaccard tier)
    *     prunes size-incompatible pairs before any aggregation: J ≤
    *     min/max, so J ≥ 0.8 needs min ≥ 0.8·max. Containment takes no
    *     prune (a short doc inside a long one is exactly its match).
    *  2. The self-join output aggregates to an exact per-pair count of
    *     shared COLD shingles (the sets are distinct-element, so count
    *     == |A∩B| restricted to sub-cap shingles) — replacing the old
    *     `.distinct()` with the same single shuffle but a result that
    *     already IS the cold intersection.
    *  3. `c` completes to the full intersection by adding the HOT-side
    *     overlap: hot shingles (df > cap) are few by construction
    *     (≤ corpus-instances/cap), so each doc's hot shingles form a
    *     tiny array and the completion join ships only those — the full
    *     shingle arrays never shuffle at all. Uncapped (cap ≤ 0) there
    *     is no hot side and the aggregate alone is exact.
    * `sh` is persisted (tracked — released by
    * [[graft.SparkEntry.releaseCaches]]) so the shingle UDF runs once
    * per doc across the index/hot/size branches. */
  private def commonWithSizes(s: SparkSession, d: String,
      sizeRatio: Option[Double] = None): DataFrame =
    commonWithSizesCap(s, d, shingleDfCap, sizeRatio)

  /** Cap-injectable variant — spec'd directly (env is immutable in a
    * test JVM, so DedupQualitySpec passes the cap explicitly). */
  private[graft] def commonWithSizesCap(s: SparkSession, d: String, cap: Long,
      sizeRatio: Option[Double] = None): DataFrame = {
    val sh = graft.CacheRegistry.persistTracked(docShingleHashes(s, d))
    val ex = sh.select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
    val (cold, hotPerDoc) =
      if (cap <= 0) (ex, None)
      else {
        // the hot set is tiny (df > cap bounds its cardinality by
        // corpus-instances/cap) — broadcast it both ways instead of
        // shuffling the exploded index through a keyed semi-join
        val hot = ex.groupBy("h").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("h")
        val hpd = ex.join(broadcast(hot), Seq("h"), "left_semi")
          .groupBy("doc_id").agg(collect_list(col("h")).as("hot_hs"))
        (ex.join(broadcast(hot), Seq("h"), "left_anti"), Some(hpd))
      }
    val candRaw = cold.as("a").join(cold.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.n").as("na"), col("b.n").as("nb"))
    // prune BEFORE the pair aggregate — a row filter on the self-join
    // output, so incompatible pairs never reach the shuffle. The 1e-6
    // slack keeps exact-boundary ratios (ints under 1e6 shingles) on
    // the kept side of double rounding; keeping a borderline pair is
    // harmless (the count below is exact), pruning one would be a miss.
    val cand = sizeRatio match {
      case Some(r) => candRaw.where(
        least(col("na"), col("nb")).cast("double") >=
          greatest(col("na"), col("nb")) * r - 1e-6)
      case None => candRaw
    }
    val coldCounts = cand.groupBy("i", "j", "na", "nb")
      .agg(count(lit(1)).as("c_cold"))
    hotPerDoc match {
      case None =>
        coldCounts.select(col("i"), col("j"), col("c_cold").as("c"),
          col("na"), col("nb"))
      case Some(hpd) =>
        val empty = array().cast("array<bigint>")
        coldCounts
          .join(hpd.as("ha"), col("i") === col("ha.doc_id"), "left")
          .join(hpd.as("hb"), col("j") === col("hb.doc_id"), "left")
          .select(col("i"), col("j"),
            (col("c_cold") + size(array_intersect(
              coalesce(col("ha.hot_hs"), empty),
              coalesce(col("hb.hot_hs"), empty)))).cast("long").as("c"),
            col("na"), col("nb"))
    }
  }

  /** Exact near-dup pairs (i < j, jaccard >= threshold). The size
    * prune pushed into the core is semantics-free here: J ≤ min/max,
    * so a pruned pair could never clear the threshold. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    commonWithSizes(s, d, sizeRatio = Some(JaccardThreshold))
      .select(col("i"), col("j"), jaccard(col("c"), col("na"), col("nb")).as("jac"))
      .where(col("jac") >= JaccardThreshold)

  /** Near-dup pair set at LSH-scale dedup rates is orders of magnitude
    * smaller than the corpus (dozens at sf0.1). Below the gate, run
    * union-find on the driver — deterministic min-label roots, no
    * iterative-framework overhead (GraphX CC here cost ~8 s of fixed
    * Pregel machinery per run on a 25-edge graph). Above the gate (a
    * corpus whose pair graph itself is big), fall back to GraphX CC —
    * component label == min vertex id either way, so the two paths are
    * value-identical. Same size-gated-with-named-fallback discipline as
    * the brute-cosine and eval-gram materializations. */
  private val MaxDriverPairs = 2000000L

  private[queries] def pairsToClusters(s: SparkSession, pairs: DataFrame): DataFrame = {
    import s.implicits._
    // persist before probing: otherwise the limit+collect gate would run
    // the whole pair pipeline once to count and the fallback would run
    // it AGAIN — doubling cost exactly at the scale where it hurts
    val edges = graft.CacheRegistry.persistTracked(pairs.select("i", "j"))
      .as[(Long, Long)]
    val local = edges.limit((MaxDriverPairs + 1).toInt).collect()
    if (local.length <= MaxDriverPairs) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      // iterative find + path compression: a recursive version blows the
      // JVM stack on one big cluster's long parent chain
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      for ((a, b) <- local) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by MIN root: labels match GraphX's CC
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val verts = local.flatMap { case (a, b) => Seq(a, b) }.distinct
      verts.map(v => (v, find(v))).toSeq.toDF("doc_id", "root")
    } else {
      val erdd = edges.rdd
        .map { case (a, b) => org.apache.spark.graphx.Edge(a, b, 1.0) }
        .coalesce(s.sparkContext.defaultParallelism)
      org.apache.spark.graphx.Graph.fromEdges(erdd, 0)
        .connectedComponents() // component label == min vertex id
        .vertices.toDF("doc_id", "root")
    }
  }

  override def queries: Map[String, Q] = Map(
    // Exact dedup: group on content hash, keep min doc_id.
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), xxhash64(normalizeStr(col("text"))).as("h"))
        .groupBy("h")
        .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_copies"))
        .select("survivor", "n_copies")),

    // Exact n-gram Jaccard pairs >= 0.8 via inverted shingle-hash index.
    "dedup_ngram_jaccard" -> ((s, d) => jaccardPairs(s, d)),

    // Cross-document duplicated-SPAN fraction — the exact-substring
    // dedup signal (Lee et al. 2022, "Deduplicating Training Data
    // Makes Language Models Better") at fixed 8-token granularity:
    // per document, the share of its distinct 8-token windows that
    // also appear verbatim in ANOTHER document. Doc-level Jaccard
    // (the tier above) misses a boilerplate paragraph pasted into
    // otherwise-unrelated documents; this tier is what catches it.
    // Within-doc repeats count once — the distinct (doc, span) set
    // makes the per-span window count exactly "documents containing
    // this span". Shape: spans hash to 8 bytes map-side (codegen
    // PolyHash64, replayed in the oracle's HUGEINT arithmetic), so
    // only (doc_id, hash) pairs ever shuffle — never span text; the
    // document frequency rides a count window over the hash
    // partitioning (linear in the hottest span's postings — a
    // universal boilerplate span costs one long partition scan, not a
    // pair blowup).
    "dedup_span_fraction" -> ((s, d) => {
      val w = 8
      val byH = org.apache.spark.sql.expressions.Window.partitionBy("h")
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) >= w)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(t)-$w), i -> array_join(slice(t, i+1, $w), chr(1)))"))
          .as("sp"))
        .select(col("doc_id"), graft.functions.PolyHash64Expr(col("sp")).as("h"))
        .distinct()
        .withColumn("docs_with", count(lit(1)).over(byH))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_spans"), col("n_shared"),
          round(col("n_shared").cast("double") / col("n_spans"), 6)
            .as("dup_fraction"))
    }),

    // Pairs -> clusters: connected components over the near-dup pair
    // graph (GraphX), canonical survivor = min doc_id per cluster —
    // the final step a production dedup pipeline actually keys on.
    "dedup_clusters" -> ((s, d) => {
      import s.implicits._
      val pairs = pairsToClusters(s, jaccardPairs(s, d))
      // members is a PRESENTATION list, sliced to MemberCap ids (the
      // NeighborCap discipline — r9): a degenerate corpus-wide cluster
      // would otherwise build one row-sized-as-the-cluster string in a
      // single reducer. cluster_size stays exact and uncapped; the
      // oracle slices identically.
      pairs
        .groupBy(col("root").as("survivor"))
        .agg(count(lit(1)).as("cluster_size"),
          concat_ws("|",
            slice(sort_array(collect_list(col("doc_id"))), 1, MemberCap))
            .as("members"))
    }),

    // Survivor selection — the step that actually rewrites a corpus:
    // per near-dup cluster keep ONE canonical document (the longest;
    // ties to the smallest doc_id; a null n_chars orders FIRST in the
    // struct min, so the oracle's rank says DESC NULLS FIRST to match)
    // and flag the rest for dropping.
    // The argmax is a single fully-combinable min-of-(−n_chars, id)
    // struct aggregate riding the cluster root — no window pass, so a
    // pathological mega-cluster costs one combinable reduction, not a
    // per-cluster sort. The keep/drop flag joins back on root, reusing
    // the aggregate's hash partitioning.
    "dedup_survivors" -> ((s, d) => {
      val roots = pairsToClusters(s, jaccardPairs(s, d))
      // two consumers (argmax + final join) — persist, or the whole
      // cluster derivation (above the driver gate: a GraphX CC job)
      // executes twice
      val joined = graft.CacheRegistry.persistTracked(
        roots.join(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          Seq("doc_id")))
      val best = joined.groupBy("root")
        .agg(min(struct((-col("n_chars")).as("negn"), col("doc_id").as("bd"))).as("m"))
        .select(col("root"), col("m.bd").as("best"))
      joined.join(best, Seq("root"))
        .select(col("root"), col("doc_id"), col("n_chars"),
          when(col("doc_id") === col("best"), 1L).otherwise(0L).as("kept"))
    }),

    // Dedup-savings report — the pipeline-economics rollup a curation
    // run publishes: per SOURCE, how many documents sit in near-dup
    // clusters, how many the survivor pass drops, and the characters
    // (≈ bytes) reclaimed. Same cluster + longest-wins machinery as
    // dedup_survivors, then ONE source-cardinality aggregate over the
    // flagged rows (clustered docs only — the corpus never re-scans);
    // chars_saved is an exact integer sum. Rolls the per-cluster
    // verdicts up to the view a storage bill actually shows.
    "dedup_savings_by_source" -> ((s, d) => {
      val roots = pairsToClusters(s, jaccardPairs(s, d))
      val joined = graft.CacheRegistry.persistTracked(
        roots.join(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars"), col("source")),
          Seq("doc_id")))
      val best = joined.groupBy("root")
        .agg(min(struct((-col("n_chars")).as("negn"), col("doc_id").as("bd"))).as("m"))
        .select(col("root"), col("m.bd").as("best"))
      joined.join(best, Seq("root"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_clustered_docs"),
          sum(when(col("doc_id") =!= col("best"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("doc_id") =!= col("best"), col("n_chars")).otherwise(lit(0L)))
            .cast("long").as("chars_saved"))
    }),

    // Containment (asymmetric Jaccard): |A∩B| / min(|A|,|B|) — catches
    // a short doc embedded in a longer one, which symmetric Jaccard
    // dilutes below threshold. Same shared inverted-index core as the
    // Jaccard query, different final ratio.
    "dedup_containment" -> ((s, d) =>
      commonWithSizes(s, d)
        .select(col("i"), col("j"),
          round(col("c").cast("double") / least(col("na"), col("nb")), 6)
            .as("containment"))
        .where(col("containment") >= ContainmentThreshold)),

    // MinHash(64) + LSH(16 bands × 4) candidates, exact-verified.
    "dedup_minhash_lsh" -> ((s, d) => {
      val sh = docShingleHashes(s, d)
      // The signature relation is consumed four times (bucket self-join
      // ×2, verify join ×2) and column pruning specializes each branch,
      // so exchange reuse can't kick in — persist() materializes the
      // sketch index once, the way a production dedup pipeline
      // checkpoints its signature table before the candidate join.
      val sig = graft.CacheRegistry.persistTracked(
        sh.select(col("doc_id"), col("hs"),
          lshBands(minhashSignature(col("hs"), 64), 16, 4).as("bands")))
      val buckets = sig.select(col("doc_id"), explode(col("bands")).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .distinct()
      cand
        .join(sig.select(col("doc_id"), col("hs")).as("da"), col("i") === col("da.doc_id"))
        .join(sig.select(col("doc_id"), col("hs")).as("db"), col("j") === col("db.doc_id"))
        .select(col("i"), col("j"),
          jaccard(size(array_intersect(col("da.hs"), col("db.hs"))),
            size(col("da.hs")), size(col("db.hs"))).as("jac"))
        .where(col("jac") >= JaccardThreshold)
    }),

    // Cascade dedup — the production two-tier shape (a hash tier for
    // recall, an embedding tier for precision): exact-verified Jaccard
    // near-dup pairs are CONFIRMED or REFUTED semantically by the
    // corpus's embedding column (doc_id = vec_id on this corpus). A
    // pair both tiers agree on ('both') is a safe drop; a hash-dup
    // whose vectors disagree ('hash_only' — boilerplate wrappers
    // around different payloads) is exactly the false-positive audit a
    // production pass reviews before deleting bytes; 'no_vector' marks
    // embedding-coverage gaps (real at sf0.1, where only 2 of 5 docs
    // carry vectors — a LEFT join, so the hash verdict is never
    // silently dropped with its evidence). Stage 2 costs two equi-joins
    // of the TINY pair set against the embedding column — the corpus
    // never reshuffles, and at 100 TB the pair side broadcasts (pairs
    // ≪ corpus by the dedup rate). NaN (a zero vector's 0/0 cosine) is
    // excluded from confirmation on BOTH engines (the
    // NanOrderingAuditSpec invariant): an unverifiable pair stays
    // 'hash_only', it does not get promoted by NaN ordering.
    "dedup_cascade" -> ((s, d) => {
      // r18 census note: a §3.2 semi-join key cut of the embedding side
      // (pin pairs, cut e to the pair keys, broadcast the cut) was
      // tried and MEASURED SLOWER at bench scale (interleaved A/B,
      // non-overlapping: 2.96-3.43 s -> 3.44-3.79 s) — two extra pins
      // and two extra stages against a corpus whose embeddings already
      // broadcast whole. Kept as-is; at a scale where embeddings stop
      // broadcasting, the key cut is the right move (a LeftOuter BHJ
      // must build the embedding side, so the uncut form degrades to
      // two corpus shuffles) and the A/B framework to re-judge it is in
      // tools/ab_probe.sh.
      val pairs = jaccardPairs(s, d)
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      pairs
        .join(e.as("ea"), col("i") === col("ea.vec_id"), "left")
        .join(e.as("eb"), col("j") === col("eb.vec_id"), "left")
        .withColumn("sim",
          when(col("ea.vec_id").isNotNull && col("eb.vec_id").isNotNull,
            round(cosineLoop(col("ea.embedding"), col("eb.embedding"), Dim), 6)))
        .select(col("i"), col("j"), col("jac"),
          when(!isnan(col("sim")) && col("sim") >= CosineThreshold, col("sim"))
            .as("sim_confirmed"),
          when(col("ea.vec_id").isNull || col("eb.vec_id").isNull, lit("no_vector"))
            .when(!isnan(col("sim")) && col("sim") >= CosineThreshold, lit("both"))
            .otherwise(lit("hash_only")).as("verdict"))
    }),

    // SimHash fingerprint + hamming-band candidate counts per doc.
    // Element hashes are PolyHash64 (not xxhash64) so the ENTIRE sketch
    // — 63-bit majority vote, 16-bit hamming bands, candidate counts —
    // is reproduced in DuckDB HUGEINT arithmetic and value-graded.
    "dedup_simhash" -> ((s, d) => {
      // pinned (r18 scan census): docs is referenced by BOTH sides of
      // the band self-join and by the final decoration join, so the
      // unpersisted form ran the simhash kernel (tokenize + per-token
      // PolyHash64 + 63-bit majority vote) three times per run. The
      // pin is one (doc_id, int64) row per doc.
      val docs = graft.CacheRegistry.persistTracked(
        Tables.fanout(Tables.documents(s, d))
          .select(col("doc_id"), simhash(polyElementHashes(tokens(col("text")))).as("sh")))
      val chunks = docs
        .select(col("doc_id"), explode(simhashChunks(col("sh"))).as("cc"))
        .select(col("doc_id"), col("cc.chunk").as("chunk"), col("cc.value").as("value"))
      val cand = chunks.as("a").join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("other"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_band_candidates"))
      docs.join(cand, Seq("doc_id"), "left")
        .select(col("doc_id"), col("sh").as("simhash"),
          coalesce(col("n_band_candidates"), lit(0L)).as("n_band_candidates"))
    }),

    // Embedding near-dup: all pairs with cosine >= 0.4. Brute-force
    // O(n²) reference path (SRP-LSH in SimilarityQueries is the scale
    // path) — but as a broadcast + mapPartitions kernel, not a
    // nested-loop join: BNLJ materializes every candidate pair as a row
    // (~550 B × n²/2) before the filter throws 99.99% away, while the
    // kernel streams the broadcast vector block per partition and emits
    // only survivors. Same double math in the same index order as the
    // unrolled column expression, so the DuckDB oracle still matches
    // bit-for-bit.
    "dedup_embedding_cosine" -> ((s, d) => {
      import s.implicits._
      val e = Tables.fanout(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
      // Hard size gate: the brute tier materializes the build side on
      // the driver (exactly like Spark's own BroadcastExchange would).
      // Beyond the broadcast envelope the right tool is the bucketed
      // approximate path — fail fast toward it instead of OOMing the
      // driver at cluster scale.
      val n = e.count()
      val maxBuildRows = 2000000L // ~512 MB at 64 float dims
      require(n <= maxBuildRows,
        s"dedup_embedding_cosine is the brute-force reference tier: $n vectors exceed " +
          s"the $maxBuildRows-row broadcast envelope; use sim_topk_srp (SRP-LSH) at this scale")
      val all = e.collect().sortBy(_._1) // == the BNLJ build side
      val norms = all.map { case (_, v) =>
        var nsq = 0.0; var i = 0
        while (i < v.length) { nsq += v(i).toDouble * v(i).toDouble; i += 1 }
        nsq
      }
      val bc = s.sparkContext.broadcast((all, norms))
      val thr = CosineThreshold
      e.mapPartitions { it =>
        val (vecs, nsqs) = bc.value
        it.flatMap { case (ida, va) =>
          var nsqA = 0.0; var i = 0
          while (i < va.length) { nsqA += va(i).toDouble * va(i).toDouble; i += 1 }
          val out = Seq.newBuilder[(Long, Long, Double)]
          var j = 0
          while (j < vecs.length) {
            val (idb, vb) = vecs(j)
            if (idb > ida) {
              var dot = 0.0; var k = 0
              while (k < va.length) { dot += va(k).toDouble * vb(k).toDouble; k += 1 }
              val sim = dot / math.sqrt(nsqA * nsqs(j))
              // pre-filter with slack; the exact rounded filter runs in
              // SQL. NaN (a zero vector's 0/0) fails this IEEE
              // comparison — deliberate, and the oracle's NOT isnan
              // mirrors it: SQL engines order NaN ABOVE every number,
              // so an unmirrored oracle would emit (i, j, NaN) pairs
              // the kernel correctly suppresses (planted zero-vector
              // fixture in DedupQualitySpec)
              if (sim >= thr - 1e-6) out += ((ida, idb, sim))
            }
            j += 1
          }
          out.result()
        }
      }.toDF("i", "j", "raw")
        .select(col("i"), col("j"), round(col("raw"), 6).as("sim"))
        .where(col("sim") >= thr)
    }),

    // Incremental dedup: near-dups of an arriving batch against the
    // HISTORICAL corpus (plus within the batch), without touching
    // history-vs-history — the query a daily ingest actually runs.
    // The history side stands in for a persisted shingle index
    // (Warehouse-bucketed in production); only the new batch's shingles
    // probe it, so incremental cost scales with the batch, not the
    // corpus. Split here: even doc_ids = history, odd = new batch.
    "dedup_incremental" -> ((s, d) => {
      val sh = graft.CacheRegistry.persistTracked(
        Tables.fanout(Tables.documents(s, d))
          .select(col("doc_id"), wordShingleHashes(col("text"), 3).as("hs"))
          .where(size(col("hs")) > 0)
          .withColumn("is_new", pmod(col("doc_id"), lit(2)) === 1))
      val sizes = sh.select(col("doc_id"), size(col("hs")).as("n"))
      val ex = sh.select(col("doc_id"), col("is_new"), explode(col("hs")).as("h"))
      // probe = new batch only; build = everything (history index + the
      // batch itself, for new-vs-new pairs). i < j dedups new-new pairs;
      // new-vs-history keeps the NEW doc on the left.
      val common = ex.where(col("is_new")).as("a")
        .join(ex.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id") &&
            (!col("b.is_new") || col("a.doc_id") < col("b.doc_id")))
        .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          col("b.is_new").as("j_is_new"))
        .agg(count(lit(1)).as("c"))
      common
        .join(sizes.as("sa"), col("i") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("j") === col("sb.doc_id"))
        .select(col("i"), col("j"),
          when(col("j_is_new"), "batch").otherwise("history").as("against"),
          jaccard(col("c"), col("sa.n"), col("sb.n")).as("jac"))
        .where(col("jac") >= JaccardThreshold)
    }),

    // Incremental SEMANTIC dedup — dedup_incremental's embedding-space
    // sibling, the query a daily embedding ingest runs: near-dups of an
    // arriving vector batch against the HISTORICAL corpus (plus
    // keep-first within the batch), never history-vs-history. The
    // history side stands in for a persisted SRP-bucketed vector index
    // (io/VectorIndex in production); the quantizer width comes from
    // the HISTORY count alone (semBselFor — an index's width is fixed
    // at build time; the batch buckets with the index's width, the
    // semanticDecontTag policy). Candidates = same sign bucket; the
    // build side (history AND earlier-batch) is capped per (bucket,
    // side) at semIncrCap by vec_id while the probe side never is, so
    // the worst adversarial bucket costs O(batch · 2·cap) — linear in
    // the batch, like every pair stage in this file. cosineLoop +
    // explicit NaN exclusion (the NanOrderingAuditSpec invariant): a
    // zero vector's 0/0 cosine must not flag in either engine.
    // Split here: even vec_ids = history/index, odd = arriving batch.
    "dedup_semantic_incremental" -> ((s, d) => {
      val emb = Tables.fanout(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"))
      val bucketed = graft.CacheRegistry.persistTracked(
        emb.crossJoin(broadcast(
            semBselFor(s, emb.where(pmod(col("vec_id"), lit(2)) === 0))))
          .select(col("vec_id"), col("embedding"),
            signBucket(col("embedding"), col("bbits"), semCoeffs, Dim).as("bucket"),
            (pmod(col("vec_id"), lit(2)) === 1).as("is_new")))
      val bySide = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket", "is_new").orderBy(col("vec_id").asc)
      val build =
        if (semIncrCap <= 0) bucketed
        else bucketed.withColumn("brn", row_number().over(bySide))
          .where(col("brn") <= semIncrCap).drop("brn")
      bucketed.where(col("is_new")).as("a")
        .join(build.as("b"),
          col("a.bucket") === col("b.bucket") &&
            (!col("b.is_new") || col("b.vec_id") < col("a.vec_id")))
        .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
          when(col("b.is_new"), lit("batch")).otherwise(lit("history")).as("against"),
          round(cosineLoop(col("a.embedding"), col("b.embedding"), Dim), 6).as("sim"))
        .where(!isnan(col("sim")) && col("sim") >= CosineThreshold)
    }),

    // The PERSISTED-INDEX path of the above, hash-graded end-to-end
    // (r12 VERDICT #4: SemanticIndex's probe was spec-pinned equal to
    // the query form but no CORRECTNESS row ever executed the stored
    // table). Build writes the HISTORY slice (even vec_ids) as an
    // SRP-sign bucketBy table + a 1-row meta relation freezing the
    // quantizer width; probe buckets the arriving batch (odd vec_ids)
    // with the FROZEN width and equi-joins per bucket — the stored
    // corpus streams in its bucket layout and never exchanges
    // (PlanInvariantsSpec pins the index side Exchange-free). Pair
    // contract = dedup_semantic_incremental's against='history' slice:
    // same cap (per bucket — the index holds one side), same
    // NaN-guarded round-6 cosine, same threshold; the oracle is that
    // history-slice SQL verbatim, so the STORAGE half (layout, frozen
    // width, probe-time cap) is what the hash grades.
    "dedup_semantic_indexed" -> ((s, d) => {
      // no fanout: signBucket is cheap per row, and a repartition on
      // the batch side would put the plan's ONLY Exchange into the
      // graded probe (the zero-Exchange pin is the point of this row)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      // table name per sf dir: two Verify runs in one JVM must not
      // probe each other's history
      val table = s"sem_idx_${java.lang.Integer.toHexString(d.hashCode)}"
      graft.io.SemanticIndex.build(s,
        emb.where(pmod(col("vec_id"), lit(2)) === 0), table)
      graft.io.SemanticIndex.probe(s,
          emb.where(pmod(col("vec_id"), lit(2)) === 1), table)
        .select(col("new_id"), col("vec_id"), col("sim"))
    }),

    // SemDeDup-style semantic dedup, bucket-local edition (r10 VERDICT
    // #1: the adaptive-K scheme assigned every vector against ALL
    // K = ceil(N/64) broadcast centroids — O(N²/64) work plus a
    // broadcast that GREW with N; the ×16 soak kneed 7.2 → 29.1 s for
    // 2× data). Now the coarse quantizer is an SRP sign bucket (the
    // learned tier's discipline, moved onto the raw float vectors):
    // B = smallest b with 2^b·64 ≥ N (integer caps-table selection,
    // no log2), bucket bit p set iff the integer-coefficient
    // projection Σ c(p,i)·v(i) is positive — every product exact in
    // double (±512 × a float mantissa = 34 significant bits),
    // summation order fixed left-to-right, so DuckDB replays the
    // bucket bit-for-bit. Each bucket's centroids are its first
    // CentsPerBucket members by vec_id (a window, not a trained
    // quantizer — `VectorKMeans.fit` is the production plug-in; the
    // assignment math is what matters), and every vector assigns to
    // the nearest centroid IN ITS OWN BUCKET: O(N·C) work via an
    // equi-join on bucket, and nothing broadcast grows with N.
    // Near-dups only WITHIN a cluster, and only among a cluster's
    // first semClusterCap members by vec_id (adversarial mass piling
    // into one bucket stays bounded — the df-cap discipline; the
    // census row set keeps EVERY vector). The recall trade (pairs
    // straddling a bucket or cluster boundary are missed) is pinned
    // by CurationSpec's within-cluster-slice equality vs brute force.
    // Output: one row per vector with its cluster, centroid
    // similarity, and whether an earlier capped cluster member
    // already covers it (is_dup).
    "dedup_semantic" -> ((s, d) => {
      val assign = graft.CacheRegistry.persistTracked(
        semAssign(graft.CacheRegistry.persistTracked(semBucketed(s, d))))
      val byCluster = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("vec_id").asc)
      val capped =
        if (semClusterCap <= 0) assign
        else assign.withColumn("krn", row_number().over(byCluster))
          .where(col("krn") <= semClusterCap).drop("krn")
      // cosineLoop + explicit NaN exclusion (the NanOrderingAuditSpec
      // invariant): a zero vector's 0/0 cosine is NaN, which BOTH SQL
      // engines order above every number — a bare `>= threshold` would
      // mark it a dup of its entire cluster in both engines,
      // consistently graded but semantically wrong. The loop kernel
      // (bit-identical to cosineExpr) keeps the pushed-down two-conjunct
      // filter janino-safe where 2×192 unrolled terms would not be.
      val dups = capped.as("a").join(capped.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"),
          round(cosineLoop(col("a.embedding"), col("b.embedding"), Dim), 6).as("psim"))
        .where(!isnan(col("psim")) && col("psim") >= CosineThreshold)
        .select(col("vec_id")).distinct()
      assign.join(dups.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("sim"),
          coalesce(col("hit"), lit(0L)).as("is_dup"))
    }),

    // dedup_semantic with TRAINED centroids (r11 VERDICT #2): the
    // same SRP bucketing and the same capped pair/census discipline,
    // but each bucket's centroids are refined by bucket-local
    // distributed Lloyd (VectorKMeans.fitBucketed) instead of frozen
    // at the first-4-by-vec_id heuristic. Seeds ARE that heuristic's
    // centroids (iters=0 freezes them, isolating the L2-assignment
    // change as the A/B arm); each iteration is one
    // assignment equi-join + one (bucket, cluster, pos) aggregation —
    // centers stay in a DataFrame keyed by bucket, nothing driver-held
    // or broadcast grows with N, and the refinement cost is linear per
    // pass. Every arithmetic step (distance chains, vec_id-ordered
    // mean sums, the one division) is order-pinned so DuckDB replays
    // the trained centers bit-for-bit; assignment is by squared-L2
    // argmin (NaN-free even for a zero vector), the reported sim is
    // the round-6 cosine to the winning trained centroid, and the
    // within-cluster dup pass reuses dedup_semantic's NaN-guarded
    // capped kernel. DedupQualitySpec pins the quality win: mean
    // within-cluster cosine >= the heuristic's on the same corpus.
    "dedup_semantic_kmeans" -> ((s, d) => {
      val b = graft.CacheRegistry.persistTracked(semBucketed(s, d))
      val cents = graft.CacheRegistry.persistTracked(
        graft.functions.VectorKMeans.fitBucketed(
          b, CentsPerBucket, semKMeansIters, semTrainCap))
      val assign = graft.CacheRegistry.persistTracked(
        graft.functions.VectorKMeans.assignBucketLocal(
            b.select("vec_id", "bucket", "embedding"), cents)
          .select(col("vec_id"), col("cluster"), col("embedding"),
            round(cosineLoopD(col("embedding"), col("cvec")), 6).as("sim")))
      val byCluster = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("vec_id").asc)
      val capped =
        if (semClusterCap <= 0) assign
        else assign.withColumn("krn", row_number().over(byCluster))
          .where(col("krn") <= semClusterCap).drop("krn")
      val dups = capped.as("a").join(capped.as("b"),
          col("a.cluster") === col("b.cluster") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"),
          round(cosineLoop(col("a.embedding"), col("b.embedding"), Dim), 6).as("psim"))
        .where(!isnan(col("psim")) && col("psim") >= CosineThreshold)
        .select(col("vec_id")).distinct()
      assign.join(dups.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"), col("sim"),
          coalesce(col("hit"), lit(0L)).as("is_dup"))
    }),

    // SEMANTIC benchmark decontamination — the embedding-space member
    // of the decon trilogy (exact 5-grams / fuzzy shingle containment
    // live in CurationQueries): an eval vector is contaminated when
    // some TRAIN vector's cosine clears the near-dup threshold even
    // after a rewrite that shares no n-gram at all — the paraphrase
    // case BOTH text passes structurally miss. Lives here (not
    // CurationQueries) because it shares dedup_semantic's committed
    // integer-SRP quantizer and its oracle interpolation. Shape at
    // 100 TB: train vectors bucket MAP-SIDE (the signBucket kernel,
    // adaptive B); the benchmark-sized eval side expands into a
    // hamming≤2 multiprobe index (≤137 masks) that BROADCASTS under
    // the shared evalBroadcastGate, so candidates come from a bucket
    // EQUI-join — the train corpus never exchanges on anything wider
    // than its 8-byte bucket, and past the gate the same equi-join
    // shuffle-routes (unlike a brute eval×train pass, which has no
    // join key to fall back on). Exact cosine re-ranks candidates
    // only. Recall is per-table SRP recall (DecontMasks scaladoc);
    // deterministic given the data, so DuckDB replays it exactly.
    "pipe_decontaminate_semantic" -> ((s, d) => decontaminateSemanticGate(s, d)))

  /** The whole SimHash sketch reproduced in DuckDB: PolyHash64 per token
    * in HUGEINT mod-2^64 (same trick as the fingerprint oracle; ASCII
    * corpus so ord(char) == byte), bit j extracted as (h // 2^j) % 2
    * (identical to the JVM's logical shift on the unsigned residue),
    * 63-term majority vote, then the 4×16-bit hamming-band candidate
    * join. Value-grades simhash AND the banding counts. */
  private val simhashOracle: String = {
    val two64 = "CAST('18446744073709551616' AS HUGEINT)"
    val seed = "CAST(1125899906842597 AS HUGEINT)"
    // splitmix64 in HUGEINT, staged as chained list_transforms so each
    // stage's input is a bound variable (never a re-evaluated
    // subexpression). 64×64 multiply mod 2^64 splits the multiplicand
    // at 2^32 to stay inside HUGEINT.
    val K0 = java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)
    val K1 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
    val K2 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)
    def mul64(a: String, k: String) =
      s"((($a // 4294967296) * $k % 4294967296) * 4294967296 + ($a % 4294967296) * $k) % $two64"
    val bitTerms = (0 until 63).map { j =>
      val p = BigInt(2).pow(j).toString
      s"(CASE WHEN 2 * list_sum(list_transform(hs, h -> CAST((h // $p) % 2 AS BIGINT))) > len(hs) THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val chunkRows = (0 until 4).map { c =>
      val div = BigInt(2).pow(16 * c).toString
      val sel = if (c == 0) s"SELECT doc_id, 0 AS c, (simhash // $div) % 65536 AS v FROM sh"
      else s"SELECT doc_id, $c, (simhash // $div) % 65536 FROM sh"
      sel
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS ts
  FROM documents),
poly AS (
  SELECT doc_id, list_transform(ts, t ->
    (list_reduce(
      list_prepend($seed,
        list_transform(range(1, length(t) + 1), i -> CAST(ord(substr(t, i, 1)) AS HUGEINT))),
      (acc, b) -> (acc * 31 + b) % $two64) + $K0) % $two64) AS h0
  FROM toks),
sm1 AS (SELECT doc_id, list_transform(h0, z -> xor(z, z // 1073741824)) AS h1 FROM poly),
sm2 AS (SELECT doc_id, list_transform(h1, w -> ${mul64("w", K1)}) AS h2 FROM sm1),
sm3 AS (SELECT doc_id, list_transform(h2, z -> xor(z, z // 134217728)) AS h3 FROM sm2),
sm4 AS (SELECT doc_id, list_transform(h3, w -> ${mul64("w", K2)}) AS h4 FROM sm3),
hashed AS (SELECT doc_id, list_transform(h4, z -> xor(z, z // 2147483648)) AS hs FROM sm4),
sh AS (SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash FROM hashed),
ex AS (
  $chunkRows),
cand AS (
  SELECT DISTINCT a.doc_id, b.doc_id AS other
  FROM ex a JOIN ex b ON a.c = b.c AND a.v = b.v AND a.doc_id <> b.doc_id),
cnt AS (SELECT doc_id, count(*) AS n FROM cand GROUP BY 1)
SELECT sh.doc_id, sh.simhash, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_band_candidates
FROM sh LEFT JOIN cnt ON sh.doc_id = cnt.doc_id"""
  }

  /** DuckDB 1-indexed unrolled dot product, same index order as
    * [[VectorFunctions.dotExpr]] so double summation matches bitwise. */
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a.embedding[$i] AS DOUBLE) * CAST($b.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  /** The [[VectorFunctions.sqDistLoopD]] kernel replayed term-by-term:
    * float embedding vs double centroid list, subtract-square summed
    * left-to-right (the squared subexpression evaluates to the same
    * double both times, so recomputing it is bit-free). */
  private def sqDistSql(e: String, c: String): String =
    (1 to Dim).map(i =>
      s"(CAST($e.embedding[$i] AS DOUBLE) - $c.cv[$i]) * " +
        s"(CAST($e.embedding[$i] AS DOUBLE) - $c.cv[$i])")
      .mkString(" + ")

  /** [[VectorFunctions.cosineLoopD]]'s three accumulators, unrolled:
    * float×double dot, float norm, double centroid norm. Two aliases
    * (embedding side / centroid side) so the cosine can be computed
    * AFTER the skinny argmin window, joining the vectors back only for
    * the winning (vec, center) rows — the r13 `afw` CTE threaded both
    * 64-wide vectors through the window sort for every candidate row,
    * which dominated the oracle's peak memory (the r13 driver-gate
    * DuckDB OOM). */
  private def dotEcSql(e: String, c: String): String =
    (1 to Dim).map(i => s"CAST($e.embedding[$i] AS DOUBLE) * $c.cv[$i]").mkString(" + ")
  private def normESql(e: String): String =
    (1 to Dim).map(i =>
      s"CAST($e.embedding[$i] AS DOUBLE) * CAST($e.embedding[$i] AS DOUBLE)").mkString(" + ")
  private def normCSql(c: String): String =
    (1 to Dim).map(i => s"$c.cv[$i] * $c.cv[$i]").mkString(" + ")

  /** Per-coordinate Lloyd-update mean over ONE ordered member-vector
    * list: coordinate j summed left-to-right from +0.0 in vec_id order
    * (list_prepend emulates the Spark aggregate's 0.0 initial value),
    * divided once in double — the exact op sequence of fitBucketed's
    * sorted-collect aggregate. Bit-identical to the r13 form (64
    * separate `list(e.embedding[j] ORDER BY vec_id)` aggregates):
    * extracting v[j] from the vec_id-ordered list of cast vectors
    * yields the same double sequence per coordinate, summed in the
    * same order. The single-list shape exists for memory: one ordered
    * aggregate's sort state per group instead of 64. */
  private def kmeansMeanColsSql: String =
    (1 to Dim).map(j =>
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(s.vs, v -> v[$j])), (x, y) -> x + y) " +
        s"/ CAST(s.n AS DOUBLE)")
      .mkString(", ")

  /** The bucket-local Lloyd iterations as a generated CTE chain —
    * produced from the SAME semKMeansIters the Spark loop runs, so
    * refinement depth can never diverge between engines. The argmin
    * window sorts SKINNY rows (vec_id, bucket, cluster, d) — the
    * squared distance is computed in the join projection, never
    * carrying the vectors into the window sort. */
  private def kmeansIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      val prev = s"k${i - 1}"
      s"""a$i AS (
         |  SELECT vec_id, bucket, cluster FROM (
         |    SELECT vec_id, bucket, cluster,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT t.vec_id, t.bucket, c.cluster,
         |        (${sqDistSql("t", "c")}) AS d
         |      FROM tv t JOIN $prev c ON t.bucket = c.bucket))
         |  WHERE rn = 1),
         |s$i AS (
         |  SELECT a.bucket, a.cluster,
         |    list(list_transform(e.embedding, x -> CAST(x AS DOUBLE))
         |      ORDER BY a.vec_id) AS vs,
         |    count(*) AS n
         |  FROM a$i a JOIN embeddings e ON a.vec_id = e.vec_id
         |  GROUP BY 1, 2),
         |k$i AS (
         |  SELECT c.bucket, c.cluster,
         |    CASE WHEN s.cluster IS NULL THEN c.cv
         |         ELSE [$kmeansMeanColsSql] END AS cv
         |  FROM $prev c LEFT JOIN s$i s
         |    ON c.bucket = s.bucket AND c.cluster = s.cluster)""".stripMargin
    }.mkString(",\n")

  /** The caps table of the adaptive B selection as SQL VALUES rows —
    * generated from the SAME Scala table the Spark plan joins. */
  private val semCapsValues: String =
    semCaps.map { case (b, cap) => s"($b, $cap)" }.mkString(", ")

  private val decontMaskValues: String =
    DecontMasks.map(m => s"($m)").mkString(", ")

  /** The signBucket UDF replayed in SQL: per plane p a bare
    * left-to-right chain of `coeff * CAST(e.embedding[i] AS DOUBLE)`
    * terms (each product exact — integer coefficient × float value —
    * so only the shared summation order rounds), one CASE per plane
    * gated on p < bbits contributing 2^p when the projection is
    * positive. Coefficients interpolated from [[semCoeffs]]. */
  private val semBucketSql: String =
    semCoeffs.zipWithIndex.map { case (row, p) =>
      val proj = row.zipWithIndex
        .map { case (c, i) => s"$c * CAST(e.embedding[${i + 1}] AS DOUBLE)" }
        .mkString(" + ")
      // NOT isnan: a NaN embedding component makes the projection NaN,
      // and DuckDB comparisons treat NaN as GREATER than everything
      // (NaN > 0 is TRUE) where the Spark kernel's IEEE `proj > 0` is
      // false — unguarded, a corrupt vector buckets differently on the
      // two engines (r14 embeddings axis caught this live)
      s"(CASE WHEN bsel.bbits > $p AND NOT isnan($proj) AND ($proj) > 0" +
        s" THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Force `AS MATERIALIZED` on every top-level CTE of an oracle.
    * DuckDB 1.0 INLINES each CTE reference — in the semantic-dedup
    * oracles the Lloyd-iteration chain (k0→kN, each a window + an
    * ordered-list aggregate over the bucket/train subtrees) is
    * re-instantiated at EVERY downstream reference (asn, af, capped×2,
    * dups), an exponential operator-tree blowup that held ~190 MiB of
    * 256 KiB operator blocks live at once on a 500-row corpus and
    * OOM'd the r13 driver gate's memory-starved checker. Materializing
    * runs each CTE once (all are ≤corpus-size here); results are
    * identical — only the execution shape changes. CTE headers in the
    * generated SQL always sit at line start (stripMargin), so the
    * rewrite is anchored and cannot touch `CAST(x AS T)` or window
    * `OVER (` text. */
  private def materializedCtes(sql: String): String =
    sql.replaceAll("(?m)^((?:[A-Za-z0-9_]+)(?:\\([^)]*\\))?) AS \\(", "$1 AS MATERIALIZED (")
      .replaceAll("(?m)^WITH ((?:[A-Za-z0-9_]+)(?:\\([^)]*\\))?) AS \\(", "WITH $1 AS MATERIALIZED (")

  private val jaccardCtes =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS ts
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
       |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingles
       |  FROM toks WHERE len(ts) >= 3),
       |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |common AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |jpairs AS (
       |  SELECT i, j, round(c * 1.0 / (sa.n + sb.n - c), 6) AS jac
       |  FROM common
       |  JOIN sizes sa ON i = sa.doc_id
       |  JOIN sizes sb ON j = sb.doc_id
       |  WHERE round(c * 1.0 / (sa.n + sb.n - c), 6) >= $JaccardThreshold)""".stripMargin

  private val jaccardOracle =
    s"WITH $jaccardCtes\nSELECT i, j, jac FROM jpairs"

  /** Transitive closure by min-label reachability (components are tiny
    * near-dup clusters, so the quadratic closure is fine for an oracle). */
  /** Max doc ids rendered in dedup_clusters' presentation list —
    * bounds a degenerate cluster's output row (size stays exact). */
  private val MemberCap = 64

  private val clustersOracle =
    s"""WITH RECURSIVE $jaccardCtes,
       |dedges AS (SELECT i AS a, j AS b FROM jpairs UNION ALL SELECT j, i FROM jpairs),
       |dnodes AS (SELECT DISTINCT a AS doc FROM dedges),
       |cc(doc, lbl) AS (
       |  SELECT doc, doc FROM dnodes
       |  UNION
       |  SELECT e.b, cc.lbl FROM cc JOIN dedges e ON cc.doc = e.a),
       |roots AS (SELECT doc, min(lbl) AS root FROM cc GROUP BY doc)
       |SELECT root AS survivor, count(*) AS cluster_size,
       |  array_to_string(list_sort(list(doc))[1:$MemberCap], '|') AS members
       |FROM roots GROUP BY root""".stripMargin

  override def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS survivor, count(*) AS n_copies
        |FROM documents
        |GROUP BY nullif(lower(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'), '^\s+|\s+$', '', 'g')), '')""".stripMargin,

    "dedup_ngram_jaccard" -> jaccardOracle,
    // Same poly-31 HUGEINT fold as the fingerprint oracle, per span.
    "dedup_span_fraction" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                             t -> length(t) > 0) AS ts
        |  FROM documents),
        |sp AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ord(substr(s, i, 1)) AS HUGEINT))),
        |      (acc, b) -> (acc * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS h
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ts) - 6),
        |      i -> array_to_string(ts[i:i+7], chr(1)))) AS s
        |    FROM toks WHERE len(ts) >= 8)),
        |df AS (SELECT h, count(*) AS docs_with FROM sp GROUP BY h)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  round(sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
        |    AS dup_fraction
        |FROM sp JOIN df USING (h)
        |GROUP BY doc_id""".stripMargin,
    "dedup_clusters" -> clustersOracle,

    // Same transitive closure as the clusters oracle, then the same
    // longest-wins pick replayed as a window rank.
    "dedup_survivors" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |dedges AS (SELECT i AS a, j AS b FROM jpairs UNION ALL SELECT j, i FROM jpairs),
         |dnodes AS (SELECT DISTINCT a AS doc FROM dedges),
         |cc(doc, lbl) AS (
         |  SELECT doc, doc FROM dnodes
         |  UNION
         |  SELECT e.b, cc.lbl FROM cc JOIN dedges e ON cc.doc = e.a),
         |roots AS (SELECT doc, min(lbl) AS root FROM cc GROUP BY doc),
         |pick AS (
         |  SELECT r.root, d.doc_id, d.n_chars,
         |         row_number() OVER (PARTITION BY r.root
         |                            ORDER BY d.n_chars DESC NULLS FIRST, d.doc_id) AS rn
         |  FROM roots r JOIN documents d ON r.doc = d.doc_id)
         |SELECT root, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         |       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM pick""".stripMargin,
    "dedup_savings_by_source" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |dedges AS (SELECT i AS a, j AS b FROM jpairs UNION ALL SELECT j, i FROM jpairs),
         |dnodes AS (SELECT DISTINCT a AS doc FROM dedges),
         |cc(doc, lbl) AS (
         |  SELECT doc, doc FROM dnodes
         |  UNION
         |  SELECT e.b, cc.lbl FROM cc JOIN dedges e ON cc.doc = e.a),
         |roots AS (SELECT doc, min(lbl) AS root FROM cc GROUP BY doc),
         |pick AS (
         |  SELECT r.root, d.doc_id, d.n_chars, d.source,
         |         row_number() OVER (PARTITION BY r.root
         |                            ORDER BY d.n_chars DESC NULLS FIRST, d.doc_id) AS rn
         |  FROM roots r JOIN documents d ON r.doc = d.doc_id)
         |SELECT source, count(*) AS n_clustered_docs,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_saved
         |FROM pick GROUP BY 1""".stripMargin,

    "dedup_containment" ->
      s"""WITH $jaccardCtes
         |SELECT i, j, round(c * 1.0 / least(sa.n, sb.n), 6) AS containment
         |FROM common
         |JOIN sizes sa ON i = sa.doc_id
         |JOIN sizes sb ON j = sb.doc_id
         |WHERE round(c * 1.0 / least(sa.n, sb.n), 6) >= $ContainmentThreshold""".stripMargin,
    // LSH+verify equals brute force w.h.p. — graded against the same
    // exact oracle, which is the point of the verify stage.
    "dedup_minhash_lsh" -> jaccardOracle,

    "dedup_cascade" ->
      s"""WITH $jaccardCtes,
         |sims AS (
         |  SELECT p.i, p.j, p.jac, x.vec_id AS xv, y.vec_id AS yv,
         |    round((${dotSql("x", "y")}) /
         |      sqrt((${dotSql("x", "x")}) * (${dotSql("y", "y")})), 6) AS sim
         |  FROM jpairs p
         |  LEFT JOIN embeddings x ON x.vec_id = p.i
         |  LEFT JOIN embeddings y ON y.vec_id = p.j)
         |SELECT i, j, jac,
         |  CASE WHEN xv IS NOT NULL AND yv IS NOT NULL AND NOT isnan(sim)
         |    AND sim >= $CosineThreshold THEN sim END AS sim_confirmed,
         |  CASE WHEN xv IS NULL OR yv IS NULL THEN 'no_vector'
         |    WHEN NOT isnan(sim) AND sim >= $CosineThreshold THEN 'both'
         |    ELSE 'hash_only' END AS verdict
         |FROM sims""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""SELECT a.vec_id AS i, b.vec_id AS j, round((${dotSql("a", "b")}) /
         |  sqrt((${dotSql("a", "a")}) * (${dotSql("b", "b")})), 6) AS sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE NOT isnan(round((${dotSql("a", "b")}) /
         |  sqrt((${dotSql("a", "a")}) * (${dotSql("b", "b")})), 6))
         |  AND round((${dotSql("a", "b")}) /
         |  sqrt((${dotSql("a", "a")}) * (${dotSql("b", "b")})), 6) >= $CosineThreshold""".stripMargin,

    "dedup_simhash" -> simhashOracle,

    "dedup_incremental" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> length(t) > 0) AS ts
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(ts)-1),
         |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingles
         |  FROM toks WHERE len(ts) >= 3),
         |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |common AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, (b.doc_id % 2 = 1) AS j_is_new, count(*) AS c
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id % 2 = 1 AND a.doc_id <> b.doc_id
         |    AND (b.doc_id % 2 = 0 OR a.doc_id < b.doc_id)
         |  GROUP BY 1, 2, 3),
         |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
         |SELECT i, j, CASE WHEN j_is_new THEN 'batch' ELSE 'history' END AS against,
         |  round(c * 1.0 / (sa.n + sb.n - c), 6) AS jac
         |FROM common
         |JOIN sizes sa ON i = sa.doc_id
         |JOIN sizes sb ON j = sb.doc_id
         |WHERE round(c * 1.0 / (sa.n + sb.n - c), 6) >= $JaccardThreshold""".stripMargin,

    // Quantizer width from the HISTORY count only (the index policy),
    // build side capped per (bucket, side) by the interpolated cap,
    // probe side uncapped, NaN-guarded round-6 cosine threshold.
    "dedup_semantic_incremental" -> materializedCtes {
      val buildCte =
        if (semIncrCap <= 0) "SELECT vec_id, bucket, is_new FROM b"
        else
          s"""SELECT vec_id, bucket, is_new FROM (
             |    SELECT vec_id, bucket, is_new, row_number() OVER (
             |      PARTITION BY bucket, is_new ORDER BY vec_id) AS brn FROM b)
             |  WHERE brn <= $semIncrCap""".stripMargin
      s"""WITH caps(bb, cap) AS (VALUES $semCapsValues),
         |bsel AS (
         |  SELECT coalesce(min(bb), $SemMaxBits) AS bbits
         |  FROM caps, (SELECT count(*) AS n FROM embeddings WHERE vec_id % 2 = 0)
         |  WHERE cap >= n),
         |b AS (
         |  SELECT e.vec_id, CAST($semBucketSql AS BIGINT) AS bucket,
         |    (e.vec_id % 2 = 1) AS is_new
         |  FROM embeddings e CROSS JOIN bsel),
         |build AS (
         |  $buildCte)
         |SELECT i, j, against, sim FROM (
         |  SELECT a.vec_id AS i, b2.vec_id AS j,
         |    CASE WHEN b2.is_new THEN 'batch' ELSE 'history' END AS against,
         |    round((${dotSql("x", "y")}) /
         |      sqrt((${dotSql("x", "x")}) * (${dotSql("y", "y")})), 6) AS sim
         |  FROM b a JOIN build b2 ON a.bucket = b2.bucket AND a.is_new
         |    AND (NOT b2.is_new OR b2.vec_id < a.vec_id)
         |  JOIN embeddings x ON x.vec_id = a.vec_id
         |  JOIN embeddings y ON y.vec_id = b2.vec_id)
         |WHERE NOT isnan(sim) AND sim >= $CosineThreshold""".stripMargin
    },

    // dedup_semantic_incremental's against='history' slice — the pair
    // contract the persisted index must reproduce from its stored
    // layout. The cap partitions by bucket alone (the index table IS
    // the history side; probe applies it per bucket at read time).
    "dedup_semantic_indexed" -> materializedCtes {
      val histCte =
        if (semIncrCap <= 0) "SELECT vec_id, bucket FROM b WHERE NOT is_new"
        else
          s"""SELECT vec_id, bucket FROM (
             |    SELECT vec_id, bucket, row_number() OVER (
             |      PARTITION BY bucket ORDER BY vec_id) AS hrn
             |    FROM b WHERE NOT is_new)
             |  WHERE hrn <= $semIncrCap""".stripMargin
      s"""WITH caps(bb, cap) AS (VALUES $semCapsValues),
         |bsel AS (
         |  SELECT coalesce(min(bb), $SemMaxBits) AS bbits
         |  FROM caps, (SELECT count(*) AS n FROM embeddings WHERE vec_id % 2 = 0)
         |  WHERE cap >= n),
         |b AS (
         |  SELECT e.vec_id, CAST($semBucketSql AS BIGINT) AS bucket,
         |    (e.vec_id % 2 = 1) AS is_new
         |  FROM embeddings e CROSS JOIN bsel),
         |hist AS (
         |  $histCte)
         |SELECT new_id, vec_id, sim FROM (
         |  SELECT a.vec_id AS new_id, h.vec_id AS vec_id,
         |    round((${dotSql("x", "y")}) /
         |      sqrt((${dotSql("x", "x")}) * (${dotSql("y", "y")})), 6) AS sim
         |  FROM b a JOIN hist h ON a.bucket = h.bucket AND a.is_new
         |  JOIN embeddings x ON x.vec_id = a.vec_id
         |  JOIN embeddings y ON y.vec_id = h.vec_id)
         |WHERE NOT isnan(sim) AND sim >= $CosineThreshold""".stripMargin
    },

    "dedup_semantic" -> materializedCtes {
      // cap disabled (soak A/B arm) → the pair stage reads a1 whole
      val cappedCte =
        if (semClusterCap <= 0) "SELECT vec_id, cluster FROM a1"
        else
          s"""SELECT vec_id, cluster FROM (
             |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
             |      ORDER BY vec_id) AS krn FROM a1)
             |  WHERE krn <= $semClusterCap""".stripMargin
      s"""WITH caps(bb, cap) AS (VALUES $semCapsValues),
         |bsel AS (
         |  SELECT coalesce(min(bb), $SemMaxBits) AS bbits
         |  FROM caps, (SELECT count(*) AS n FROM embeddings) WHERE cap >= n),
         |b AS (
         |  SELECT e.vec_id, CAST($semBucketSql AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN bsel),
         |cents AS (
         |  SELECT bucket, vec_id AS cluster FROM (
         |    SELECT bucket, vec_id, row_number() OVER (PARTITION BY bucket
         |      ORDER BY vec_id) AS crn FROM b)
         |  WHERE crn <= $CentsPerBucket),
         |sims AS (
         |  SELECT b.vec_id, c.cluster, round((${dotSql("v", "cv")}) /
         |    sqrt((${dotSql("v", "v")}) * (${dotSql("cv", "cv")})), 6) AS sim
         |  FROM b JOIN embeddings v ON b.vec_id = v.vec_id
         |       JOIN cents c ON b.bucket = c.bucket
         |       JOIN embeddings cv ON cv.vec_id = c.cluster),
         |a1 AS (
         |  SELECT vec_id, cluster, sim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY sim DESC, cluster ASC) AS rn FROM sims)
         |  WHERE rn = 1),
         |capped AS (
         |  $cappedCte),
         |dups AS (
         |  SELECT DISTINCT vec_id FROM (
         |    SELECT b2.vec_id,
         |      round((${dotSql("x", "y")}) /
         |        sqrt((${dotSql("x", "x")}) * (${dotSql("y", "y")})), 6) AS psim
         |    FROM capped a JOIN capped b2 ON a.cluster = b2.cluster AND a.vec_id < b2.vec_id
         |    JOIN embeddings x ON x.vec_id = a.vec_id
         |    JOIN embeddings y ON y.vec_id = b2.vec_id)
         |  WHERE NOT isnan(psim) AND psim >= $CosineThreshold)
         |SELECT a1.vec_id, a1.cluster, a1.sim,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
         |FROM a1 LEFT JOIN dups d ON a1.vec_id = d.vec_id""".stripMargin
    },

    // The whole trained pipeline replayed: same bucket interpolation,
    // train cap + seeds as windows, each Lloyd pass as a generated
    // (assign, sums, centers) CTE triple with vec_id-ordered
    // list_reduce sums, then the final L2 argmin, centroid cosine, and
    // the NaN-guarded capped pair stage.
    "dedup_semantic_kmeans" -> materializedCtes {
      val trCte =
        if (semTrainCap <= 0) "SELECT vec_id, bucket FROM b"
        else
          s"""SELECT vec_id, bucket FROM (
             |    SELECT vec_id, bucket, row_number() OVER (PARTITION BY bucket
             |      ORDER BY vec_id) AS trn FROM b)
             |  WHERE trn <= $semTrainCap""".stripMargin
      val cappedCte =
        if (semClusterCap <= 0) "SELECT vec_id, cluster FROM af"
        else
          s"""SELECT vec_id, cluster FROM (
             |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
             |      ORDER BY vec_id) AS krn FROM af)
             |  WHERE krn <= $semClusterCap""".stripMargin
      s"""WITH caps(bb, cap) AS (VALUES $semCapsValues),
         |bsel AS (
         |  SELECT coalesce(min(bb), $SemMaxBits) AS bbits
         |  FROM caps, (SELECT count(*) AS n FROM embeddings) WHERE cap >= n),
         |b AS (
         |  SELECT e.vec_id, CAST($semBucketSql AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN bsel),
         |tr AS (
         |  $trCte),
         |tv AS (
         |  SELECT tr.vec_id, tr.bucket, e.embedding
         |  FROM tr JOIN embeddings e ON tr.vec_id = e.vec_id),
         |k0 AS (
         |  SELECT sd.bucket, sd.vec_id AS cluster,
         |    list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM (
         |    SELECT bucket, vec_id FROM (
         |      SELECT bucket, vec_id, row_number() OVER (PARTITION BY bucket
         |        ORDER BY vec_id) AS crn FROM tr)
         |    WHERE crn <= $CentsPerBucket) sd
         |  JOIN embeddings e ON e.vec_id = sd.vec_id),
         |${
          // iters=0 (the documented seeds-only A/B arm) emits NO
          // iteration CTEs — interpolating the empty chain plus the
          // joining comma made the oracle a DuckDB syntax error
          // (r12 ADVICE); downstream joins k0 directly in that arm.
          if (semKMeansIters == 0) "" else kmeansIterCtes(semKMeansIters) + ",\n"
        }av AS (
         |  SELECT b.vec_id, b.bucket, e.embedding
         |  FROM b JOIN embeddings e ON b.vec_id = e.vec_id),
         |asn AS (
         |  SELECT vec_id, bucket, cluster FROM (
         |    SELECT vec_id, bucket, cluster,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d ASC, cluster ASC) AS rn
         |    FROM (
         |      SELECT t.vec_id, t.bucket, c.cluster,
         |        (${sqDistSql("t", "c")}) AS d
         |      FROM av t JOIN k$semKMeansIters c ON t.bucket = c.bucket))
         |  WHERE rn = 1),
         |af AS (
         |  SELECT a.vec_id, a.cluster,
         |    round((${dotEcSql("e", "c")}) /
         |      sqrt((${normESql("e")}) * (${normCSql("c")})), 6) AS sim
         |  FROM asn a
         |  JOIN embeddings e ON e.vec_id = a.vec_id
         |  JOIN k$semKMeansIters c
         |    ON c.bucket = a.bucket AND c.cluster = a.cluster),
         |capped AS (
         |  $cappedCte),
         |dups AS (
         |  SELECT DISTINCT vec_id FROM (
         |    SELECT b2.vec_id,
         |      round((${dotSql("x", "y")}) /
         |        sqrt((${dotSql("x", "x")}) * (${dotSql("y", "y")})), 6) AS psim
         |    FROM capped a JOIN capped b2 ON a.cluster = b2.cluster AND a.vec_id < b2.vec_id
         |    JOIN embeddings x ON x.vec_id = a.vec_id
         |    JOIN embeddings y ON y.vec_id = b2.vec_id)
         |  WHERE NOT isnan(psim) AND psim >= $CosineThreshold)
         |SELECT af.vec_id, af.cluster, af.sim,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
         |FROM af LEFT JOIN dups d ON af.vec_id = d.vec_id""".stripMargin
    },

    // The probe expansion replayed literally: bucket via the shared
    // semBucketSql interpolation, masks from the SAME Scala table the
    // Spark plan expands, in-range filter against the adaptive-B
    // scalar, then exact cosine on bucket-equi candidates.
    "pipe_decontaminate_semantic" -> materializedCtes(
      s"""WITH caps(bb, cap) AS (VALUES $semCapsValues),
         |bsel AS (
         |  SELECT coalesce(min(bb), $SemMaxBits) AS bbits
         |  FROM caps, (SELECT count(*) AS n FROM embeddings) WHERE cap >= n),
         |b AS (
         |  SELECT e.vec_id, CAST($semBucketSql AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN bsel),
         |masks(m) AS (VALUES $decontMaskValues),
         |probe AS (
         |  SELECT be.vec_id AS eval_id, xor(be.bucket, CAST(m.m AS BIGINT)) AS pbucket
         |  FROM b be CROSS JOIN masks m CROSS JOIN bsel
         |  WHERE be.vec_id % 50 = 0 AND m.m < (CAST(1 AS BIGINT) << bsel.bbits)),
         |cand AS (
         |  SELECT p.eval_id, bt.vec_id AS train_id
         |  FROM probe p JOIN b bt ON bt.bucket = p.pbucket
         |  WHERE bt.vec_id % 50 <> 0)
         |SELECT eval_id, train_id, sim FROM (
         |  SELECT c.eval_id, c.train_id,
         |    round((${dotSql("x", "y")}) /
         |      sqrt((${dotSql("x", "x")}) * (${dotSql("y", "y")})), 6) AS sim
         |  FROM cand c JOIN embeddings x ON x.vec_id = c.eval_id
         |       JOIN embeddings y ON y.vec_id = c.train_id)
         |WHERE NOT isnan(sim) AND sim >= $CosineThreshold""".stripMargin))
}
