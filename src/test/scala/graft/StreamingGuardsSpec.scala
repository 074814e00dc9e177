package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingGuards
import graft.streaming.StreamingGuards.Doc

/** Ingest-time guards: stateless tags agree with the batch kernels and
  * survive micro-batch boundaries. */
class StreamingGuardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  private val evalText = "alpha beta gamma delta epsilon zeta eta theta"

  test("decontamination tag: exact copy fully flagged, clean doc untouched, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evalSet = StreamingGuards.evalGramSet(
      Seq((0L, evalText)).toDF("doc_id", "text"))
    assert(evalSet.size == 4, "8 tokens -> 4 distinct 5-grams")
    val bc = spark.sparkContext.broadcast(
      StreamingGuards.ExactGrams(evalSet): StreamingGuards.EvalGramIndex)
    val mem = MemoryStream[Doc]
    val q = StreamingGuards.decontaminationTag(mem.toDS(), bc)
      .writeStream.format("memory").queryName("decon_tags")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1, ts(0), evalText))                       // exact copy
      mem.addData(Doc(2, ts(1), "one unique sentence nobody else ever wrote at all"))
      q.processAllAvailable()
      mem.addData(Doc(3, ts(2), "short"))                        // < 5 tokens
      mem.addData(Doc(4, ts(3), null))                           // missing blob
      q.processAllAvailable()
      val got = spark.table("decon_tags")
        .select("doc_id", "n_grams", "n_contaminated", "clean")
        .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
      assert(got(1L) == ((1L, 4L, 4L, false)), "exact copy: every gram contaminated")
      assert(got(2L)._3 == 0L && got(2L)._4, "clean doc passes")
      assert(got(3L) == ((3L, 0L, 0L, true)), "sub-n doc has no grams, counts as clean")
      assert(got(4L) == ((4L, 0L, 0L, true)), "null text is a data condition, not a crash")
    } finally q.stop()
  }

  test("semantic decontamination tag agrees with the batch query on the same fixture, across batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingGuards.Vec
    // the DedupQualitySpec fixture: two eval vectors, one exact train
    // copy of each, one negation (cosine −1), plus a mid-similarity
    // train vector so the threshold is exercised away from ±1
    val a = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else 0.25f)
    val w = Array.tabulate(64)(i => if (i % 3 == 0) -0.25f else 1.0f)
    val mid = a.zip(w).map { case (x, y) => x * 0.8f + y * 0.2f } // near a, not exact
    val train = Seq(1L -> a, 2L -> a.map(-_), 3L -> w, 4L -> mid)
    val evalRows = Seq(0L -> a, 50L -> w)
    val dir = s"/tmp/graft_semdecont_stream_${suiteName.hashCode}"
    (train ++ evalRows).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // batch verdicts on the identical corpus (6 vectors -> B = minimum)
    val batch = SparkEntry.queries("pipe_decontaminate_semantic")(spark, dir)
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getDouble(2))))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).toSet }
    SparkEntry.releaseCaches()
    val bits = graft.queries.DedupQueries.semBitsFor(6L)
    val idx = spark.sparkContext.broadcast(StreamingGuards.evalVecIndex(
      evalRows.toDF("vec_id", "embedding"), bits))
    val mem = MemoryStream[Vec]
    val q = StreamingGuards.semanticDecontTag(mem.toDS(), idx)
      .writeStream.format("memory").queryName("sem_decon_tags")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Vec(1, ts(0), a), Vec(2, ts(1), a.map(-_)))
      q.processAllAvailable()
      mem.addData(Vec(3, ts(2), w), Vec(4, ts(3), mid))           // batch boundary
      mem.addData(Vec(5, ts(4), Array.fill(64)(0.0f)))            // zero vector: NaN cosine
      q.processAllAvailable()
      val got = spark.table("sem_decon_tags")
        .select("vec_id", "n_contaminated", "best_sim", "clean")
        .as[(Long, Long, Option[Double], Boolean)].collect().map(r => r._1 -> r).toMap
      // per-vector agreement: contaminated on the stream ⟺ the batch
      // query emitted a pair for that train vector, with equal counts
      // AND equal best similarity — best_sim is max only over
      // THRESHOLD-CLEARED candidates (r11 ADVICE), so it reconciles
      // exactly with batch max(sim) per train id and is NULL when the
      // batch emitted nothing
      train.foreach { case (id, _) =>
        val want = batch.getOrElse(id, Set.empty)
        assert(got(id)._2 == want.size.toLong,
          s"vec $id: stream counted ${got(id)._2} eval hits, batch found $want")
        assert(got(id)._4 == want.isEmpty, s"vec $id: clean flag disagrees with batch")
        val wantBest = if (want.isEmpty) None else Some(want.map(_._2).max)
        assert(got(id)._3 == wantBest,
          s"vec $id: stream best_sim ${got(id)._3} != batch max(sim) $wantBest")
      }
      // and the fixture itself is non-degenerate: both catches present
      assert(!got(1L)._4 && !got(3L)._4, "exact copies must be flagged")
      assert(got(2L)._4, "the negation must pass clean")
      // zero vector: NaN cosine is a data condition, not a crash —
      // excluded exactly as the batch query's explicit NaN filter
      // (DedupQualitySpec pins the batch side of the same fixture)
      assert(got(5L) == ((5L, 0L, None, true)), s"zero vector must tag clean, got ${got(5L)}")
    } finally q.stop()
  }

  test("fuzzy decontamination tag agrees with the batch query on the same fixture, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two eval docs (doc_id % 50 == 0), one exact train copy of each,
    // one train doc at EXACTLY the containment threshold (2 of eval
    // 0's 4 shingles -> 0.5, pinning the >= boundary), one clean doc,
    // a null-text doc, and a sub-n doc
    val eval0 = "alpha beta gamma delta epsilon zeta"
    val eval50 = "red orange yellow green blue"
    val half = "alpha beta gamma delta"
    val train: Seq[(Long, String)] = Seq(
      1L -> eval0, 2L -> half,
      3L -> "totally unrelated words about nothing in particular here",
      4L -> eval50, 5L -> null, 6L -> "short")
    val dir = s"/tmp/graft_fuzzydecont_stream_${suiteName.hashCode}"
    (train ++ Seq(0L -> eval0, 50L -> eval50)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = SparkEntry.queries("pipe_decontaminate_fuzzy")(spark, dir)
      .collect().map(r => (r.getLong(1), (r.getLong(0), r.getDouble(4))))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).toSet }
    SparkEntry.releaseCaches()
    val idx = spark.sparkContext.broadcast(StreamingGuards.evalShingleIndex(
      Seq(0L -> eval0, 50L -> eval50).toDF("doc_id", "text")))
    val mem = MemoryStream[Doc]
    val q = StreamingGuards.fuzzyDecontTag(mem.toDS(), idx)
      .writeStream.format("memory").queryName("fuzzy_decon_tags")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1, ts(0), eval0), Doc(2, ts(1), half))
      q.processAllAvailable()
      mem.addData(Doc(3, ts(2), train.toMap.apply(3L)), Doc(4, ts(3), eval50)) // batch boundary
      mem.addData(Doc(5, ts(4), null), Doc(6, ts(5), "short"))
      q.processAllAvailable()
      val got = spark.table("fuzzy_decon_tags")
        .select("doc_id", "n_flagged", "best_containment", "clean")
        .as[(Long, Long, Option[Double], Boolean)].collect().map(r => r._1 -> r).toMap
      // per-doc agreement on all three outputs: count of flagged eval
      // docs, max containment over CLEARED evals (null when clean —
      // batch max(containment) per train doc), and the clean flag
      train.foreach { case (id, _) =>
        val want = batch.getOrElse(id, Set.empty)
        assert(got(id)._2 == want.size.toLong,
          s"doc $id: stream flagged ${got(id)._2} eval docs, batch found $want")
        assert(got(id)._4 == want.isEmpty, s"doc $id: clean flag disagrees with batch")
        val wantBest = if (want.isEmpty) None else Some(want.map(_._2).max)
        assert(got(id)._3 == wantBest,
          s"doc $id: stream best_containment ${got(id)._3} != batch max $wantBest")
      }
      // and the fixture is non-degenerate: every regime present
      assert(!got(1L)._4 && got(1L)._3.contains(1.0), "exact copy flags at containment 1")
      assert(!got(2L)._4 && got(2L)._3.contains(0.5), "threshold boundary flags (>= rule)")
      assert(got(3L)._4, "clean doc passes")
      assert(got(5L)._4 && got(6L)._4, "null / sub-n docs tag clean, not crash")
    } finally q.stop()
  }

  test("eval shingle index: df cap drops boilerplate from the universe; count gate names the batch route") {
    import spark.implicits._
    // 3 eval docs share the shingle "x y z"; cap 2 drops it from the
    // universe, so a train doc made ONLY of that shingle can't flag —
    // and each eval doc's denominator shrinks to its surviving count
    val evals = Seq(
      (0L, "x y z alpha beta"), (50L, "x y z gamma delta"), (100L, "x y z"))
    val idx = StreamingGuards.evalShingleIndex(
      evals.toDF("doc_id", "text"), dfCap = 2L)
    // "x y z" is in all 3 eval docs -> capped away; doc 100 has no
    // surviving shingles and leaves the universe entirely
    assert(!idx.nEval.contains(100L), "fully-capped eval doc leaves the universe")
    assert(idx.nEval(0L) == 2L && idx.nEval(50L) == 2L,
      "denominators count only surviving shingles")
    assert(idx.postings.values.forall(_.length <= 2), "no posting exceeds the cap")
    // oversize index fails on the COUNT with the batch route named
    val big = (1 to 4).map(i => (i.toLong, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingGuards.evalShingleIndex(big, maxRows = 3L)
    }
    assert(e.getMessage.contains("pipe_decontaminate_fuzzy"),
      "gate message must route oversize eval sets to the batch query")
  }

  test("eval vector index: count-gated before collect; oversize names the batch route") {
    import spark.implicits._
    val vecs = (0 until 8).map(i => (i.toLong, Array.fill(64)(i.toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      StreamingGuards.evalVecIndex(vecs, bits = 3, maxVecs = 4L)
    }
    assert(e.getMessage.contains("pipe_decontaminate_semantic"),
      "gate message must route oversize eval sets to the batch query")
  }

  test("quality tag matches the batch gate's thresholds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingGuards.qualityTag(mem.toDS())
      .writeStream.format("memory").queryName("quality_tags")
      .outputMode(OutputMode.Append).start()
    try {
      // 12 tokens incl. stopwords -> accepted; no stopwords -> rejected
      mem.addData(
        Doc(1, ts(0), "the quick brown fox jumps over a lazy dog in the field"),
        Doc(2, ts(1), "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      q.processAllAvailable()
      val got = spark.table("quality_tags")
        .select("doc_id", "accept").as[(Long, Boolean)].collect().toMap
      assert(got(1L) && !got(2L))
    } finally q.stop()
  }

  test("eval gram gate counts BEFORE collecting; oversize routes to Bloom with no false negatives") {
    import spark.implicits._
    val evalDocs = Seq((0L, evalText)).toDF("doc_id", "text")
    // 4 distinct grams > maxGrams=2 -> the index must come back as a
    // Bloom filter (the auto-route), never an exception, never a
    // 4-string collect
    val idx = StreamingGuards.evalGramIndex(evalDocs, maxGrams = 2L)
    assert(!idx.exact && idx.size == 4L, s"expected Bloom route, got $idx")
    // Bloom guarantee: every true eval gram still flags (no FNs)
    val grams = StreamingGuards.evalGramSet(evalDocs)
    assert(grams.forall(idx.contains), "a contaminated gram slipped the Bloom index")
    // the exact-set path fails LOUDLY (count-first, before any collect)
    val e = intercept[IllegalArgumentException] {
      StreamingGuards.evalGramSet(evalDocs, maxGrams = 2L)
    }
    assert(e.getMessage.contains("Bloom"), "gate message must name the Bloom route")
    // and a Bloom-backed tag still catches an exact copy end-to-end
    implicit val sqlCtx = spark.sqlContext
    val bc = spark.sparkContext.broadcast(idx)
    val mem = MemoryStream[Doc]
    val q = StreamingGuards.decontaminationTag(mem.toDS(), bc)
      .writeStream.format("memory").queryName("decon_bloom")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1, ts(0), evalText))
      q.processAllAvailable()
      val r = spark.table("decon_bloom")
        .select("doc_id", "n_contaminated", "clean")
        .as[(Long, Long, Boolean)].collect().head
      assert(r == ((1L, 4L, false)), s"Bloom tag missed the exact copy: $r")
    } finally q.stop()
  }

  test("giant-document axis, micro-batch edition: a hot doc streams through the fuzzy tag and leakage postings") {
    // r12 VERDICT #7: the batch gram sites are pushdown-proof (one-pass
    // wordShingleHashes kernel) and the stream twins share the kernel,
    // but no HOT_DOC probe had run in MICRO-BATCH mode — this is that
    // axis, standing. Default 200k tokens keeps the suite fast;
    // SPARK_GRAFT_HOT_DOC_TOKENS=2000000 reproduces the r12 batch
    // probe scale (the quadratic regression this guards against ground
    // a 2M-token doc for >15 min — linear is seconds).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = sys.env.getOrElse("SPARK_GRAFT_HOT_DOC_TOKENS", "200000").toInt
    val hot = {
      val sb = new java.lang.StringBuilder(n * 9)
      var i = 0
      while (i < n) { sb.append("hottok").append(i).append(' '); i += 1 }
      sb.toString
    }
    val idx = spark.sparkContext.broadcast(StreamingGuards.evalShingleIndex(
      Seq(0L -> evalText).toDF("doc_id", "text")))
    val mem = MemoryStream[Doc]
    val q = StreamingGuards.fuzzyDecontTag(mem.toDS(), idx)
      .writeStream.format("memory").queryName("fuzzy_hotdoc")
      .outputMode(OutputMode.Append).start()
    val t0 = System.nanoTime()
    try {
      mem.addData(Doc(1, ts(0), hot), Doc(2, ts(1), evalText))
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      info(f"fuzzyDecontTag hot-doc micro-batch: $n%d tokens in $wall%.2f s")
      val got = spark.table("fuzzy_hotdoc")
        .select("doc_id", "clean").as[(Long, Boolean)].collect().toMap
      assert(got(1L), "the hot doc (distinct tokens) shares no eval shingle — must tag clean")
      assert(!got(2L), "the exact eval copy must still flag in the same micro-batch")
    } finally q.stop()
    // same doc through the leakage-postings aggregate (noop sink: the
    // posting-set convergence is pinned elsewhere; this arm is the
    // kernel-under-state-store timing axis)
    val mem2 = MemoryStream[(Long, String, String)]
    val q2 = StreamingGuards.streamingLeakagePostings(
        mem2.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("noop")
      .outputMode(OutputMode.Update).start()
    val t1 = System.nanoTime()
    try {
      mem2.addData((1L, "web", hot))
      q2.processAllAvailable()
      info(f"streamingLeakagePostings hot-doc micro-batch: $n%d tokens in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    } finally q2.stop()
  }
}
