package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the curation pack beyond the DuckDB oracles:
  * planted fixtures prove the operators catch what they claim to catch
  * (the oracle only proves Spark and DuckDB agree). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft_curation_").toString

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("decontaminate: a train copy of an eval doc is flagged at ratio 1.0") {
    val dir = fixtureDir()
    writeDocs(dir, Seq(
      0L -> "alpha beta gamma delta epsilon zeta",   // eval (0 % 50 == 0)
      1L -> "alpha beta gamma delta epsilon zeta",   // exact train copy
      50L -> "one unique sentence nobody else wrote ever", // clean eval
      2L -> "completely different training content here today"))
    val got = SparkEntry.queries("pipe_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(0L) == ((2L, 2L, 1.0)), "both 5-grams of the copied doc are contaminated")
    assert(got(50L)._2 == 0L && got(50L)._3 == 0.0, "clean eval doc reports zero overlap")
  }

  test("fuzzy decontamination: an embedded copy and a one-token paraphrase are caught, light overlap is not") {
    val dir = fixtureDir()
    val evalText = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12" // 10 distinct 3-shingles
    writeDocs(dir, Seq(
      0L -> evalText,                                    // eval (0 % 50 == 0)
      1L -> s"p1 p2 $evalText s1 s2",                    // train: eval embedded whole
      2L -> "t1 t2 t3 unrelated words entirely different here now", // 1 shared shingle
      3L -> "t1 t2 t3 t4 t5 xx t7 t8 t9 t10 t11 t12",    // paraphrase: one token swapped
      50L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"))  // clean eval
    val got = SparkEntry.queries("pipe_decontaminate_fuzzy")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // embedding keeps every eval shingle (containment 1.0); the swap at
    // position 6 kills the three shingles covering it (7/10 = 0.7) —
    // which the exact 5-gram pass scores at only 3/8, the case fuzzy
    // matching exists for; the 1-shingle overlap (0.1) stays out
    assert(got == Map(
      (0L, 1L) -> ((10L, 10L, 1.0)),
      (0L, 3L) -> ((10L, 7L, 0.7))), s"got $got")
  }

  test("fuzzy decontamination: eval-df cap drops boilerplate shingles from the universe") {
    val dir = fixtureDir()
    val header = "h1 h2 h3 h4 h5 h6 h7 h8" // 6 header-only shingles, shared by all three eval docs
    writeDocs(dir, Seq(
      0L -> s"$header a1 a2 a3 a4",
      50L -> s"$header b1 b2 b3 b4",
      100L -> s"$header c1 c2 c3 c4",
      1L -> header)) // train doc: pure boilerplate
    // uncapped, the shared header alone clears the threshold for every
    // eval doc (6 of 10 shingles) — three boilerplate false positives
    val uncapped = graft.queries.CurationQueries.decontaminateFuzzyCap(spark, dir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(uncapped.toSet == Set((0L, 1L, 0.6), (50L, 1L, 0.6), (100L, 1L, 0.6)),
      s"got ${uncapped.toSeq}")
    // capped at 2, the header shingles (eval-df 3) leave the UNIVERSE —
    // n_eval shrinks to the 4 content shingles and the pure-boilerplate
    // train doc matches none of them
    val capped = graft.queries.CurationQueries.decontaminateFuzzyCap(spark, dir, 2L)
    assert(capped.count() == 0L)
  }

  test("fuzzy decontamination: the default cap is invisible on the honest corpus") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val deflt = SparkEntry.queries("pipe_decontaminate_fuzzy")(spark, sf).collect().map(key).toSet
    val off = graft.queries.CurationQueries.decontaminateFuzzyCap(spark, sf, 0L).collect().map(key).toSet
    assert(deflt == off, "default eval-df cap must not change the sf0.01 result")
    assert(deflt.nonEmpty, "sf0.01 must contain at least one fuzzy-contaminated pair (anti-vacuity)")
  }

  test("decontamination report: one row per eval doc, each signal fires on its own planted case") {
    import spark.implicits._
    val dir = fixtureDir()
    val evalText = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    writeDocs(dir, Seq(
      0L -> evalText,                                   // eval
      1L -> evalText,                                   // train exact copy: exact + fuzzy fire
      3L -> "t1 t2 t3 t4 t5 xx t7 t8 t9 t10 t11 t12",   // paraphrase: fuzzy only (0.7)
      50L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12",  // clean eval
      100L -> "f1 f2 f3 f4",                            // SHORT eval: no 5-grams to audit...
      4L -> "f1 f2 f3 f4"))                             // ...but its shingle copy must still flag
    // embeddings on the doc_id = vec_id correspondence: eval 0's vector
    // has a train near-copy (semantic fires); eval 50's does not
    val a = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else 0.25f)
    val w = Array.tabulate(64)(i => if (i % 3 == 0) -0.25f else 1.0f)
    Seq(0L -> a, 1L -> a, 3L -> w.map(-_), 50L -> w)
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("pipe_decontaminate_report")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    SparkEntry.releaseCaches()
    // eval 0: every 5-gram contaminated (exact 1.0), fuzzy max is the
    // exact copy's 1.0 (paraphrase's 0.7 loses the max), semantic max
    // is the identical vector's 1.0; eval 50: all three silent; eval
    // 100 (4 tokens — invisible to the exact pass AND without an
    // embedding row) still gets its row and flags on the fuzzy copy:
    // the spine is the documents table, not any single pass
    assert(got == Map(
      0L -> ((1.0, 1.0, 1.0, 1L)),
      50L -> ((0.0, 0.0, 0.0, 0L)),
      100L -> ((0.0, 1.0, 0.0, 1L))), s"got $got")
  }

  test("decontamination broadcast gate: past the gate both passes shuffle-route to identical rows") {
    // the stand-in eval slice (doc_id % 50) is 2% of the corpus — it
    // GROWS with N, so the forced broadcast() hint must be count-gated.
    // gate=1 forces the shuffle arm here; with the planner's own
    // broadcast logic disabled the eval index must NOT cross as a
    // broadcast, and the rows must match the broadcast arm exactly.
    val fuzzyKey = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val exactKey = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val cap = graft.queries.CurationQueries.fuzzyEvalDfCap
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fShuffle = graft.queries.CurationQueries.decontaminateFuzzyCap(spark, sf, cap, gate = 1L)
      val eShuffle = graft.queries.CurationQueries.decontaminateGate(spark, sf, gate = 1L)
      for (df <- Seq(fShuffle, eShuffle)) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastHashJoin"),
          s"past the gate (and with auto-broadcast off) nothing may force a broadcast:\n$p")
      }
      val fGot = fShuffle.collect().map(fuzzyKey).toSet
      val eGot = eShuffle.collect().map(exactKey).toSet
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      val fBc = graft.queries.CurationQueries.decontaminateFuzzyCap(spark, sf, cap, gate = 0L)
        .collect().map(fuzzyKey).toSet
      val eBc = graft.queries.CurationQueries.decontaminateGate(spark, sf, gate = 0L)
        .collect().map(exactKey).toSet
      assert(fGot == fBc, "fuzzy pass: shuffle route must return the broadcast route's rows")
      assert(eGot == eBc, "exact pass: shuffle route must return the broadcast route's rows")
      assert(fGot.nonEmpty && eGot.nonEmpty, "anti-vacuity: both passes must flag something at sf0.01")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      graft.SparkEntry.releaseCaches()
    }
  }

  test("leakage matrix: a gram in more sources than LeakDfCap is boilerplate, never a pair") {
    // r16 knob audit: LeakDfCap = 32 but the corpus max source-df is
    // 3-4 at both graded SFs (and the testdata has far fewer than 33
    // sources), so the cap's binding side was ungraded. 40 sources
    // share one boilerplate phrase (df 40 > cap — C(40,2) = 780 pair
    // rows if the cap ever leaks); two sources share a genuine gram
    // (df 2). The board must contain exactly the genuine pair.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = fixtureDir()
    val boiler = "all rights reserved contact us today"
    val genuine = "the quick brown fox jumps high"
    val rows =
      (0 until 40).map { i =>
        (i.toLong, s"filler${i}a filler${i}b $boiler", s"src$i")
      } ++ Seq(
        (100L, s"gen1fill $genuine", "gen1"),
        (101L, s"gen2fill $genuine", "gen2"))
    rows.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val board = SparkEntry.queries("pipe_leakage_matrix")(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    SparkEntry.releaseCaches()
    assert(board == Seq(("gen1", "gen2", 2L)),
      s"board must be exactly the sub-cap pair (both 6-token phrases " +
        s"yield two 5-grams): $board")
  }

  test("token fertility: hand-computed sums and ratios per source") {
    val dir = fixtureDir()
    // digits/punctuation only — subword counts are closed-form without
    // replaying the BPE merge table: digit runs + non-alnum chars
    Seq((1L, "12 34 ..", "srcA"), (2L, "7 7 7 7", "srcB"))
      .toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_token_fertility")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // srcA: words 3, subwords 2 digit runs + 2 dots = 4, chars 8
    // srcB: words 4, subwords 4 digit runs, chars 7
    assert(got == Map(
      "srcA" -> ((1L, 3L, 4L, 8L, 1.333333, 2.0)),
      "srcB" -> ((1L, 4L, 4L, 7L, 1.0, 1.75))), s"got $got")
  }

  test("classifier sweep: fixed threshold axis, monotone keep curve, agrees with the score query") {
    val rows = SparkEntry.queries("text_classifier_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet == Set(-4L, -2L, 0L, 2L, 4L))
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).toSet.size == 1, s"$src: n_docs must not vary across thresholds")
      val byT = rs.sortBy(_._1).map(_._4)
      byT.sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"$src: keep count must be non-increasing in the threshold") }
      rs.foreach { case (_, _, n, k, rate) =>
        assert(rate == math.rint(k.toDouble / n * 1e6) / 1e6) }
    }
    // cross-query pin: the t=0 column counts exactly the docs the score
    // query marks non-negative (same scored-doc universe)
    val keptAt0 = rows.filter(_._1 == 0L).map(_._4).sum
    val nonNeg = SparkEntry.queries("text_classifier_score")(spark, sf)
      .where(col("score") >= 0).count()
    assert(keptAt0 == nonNeg, s"sweep t=0 kept $keptAt0 vs score-query non-negative $nonNeg")
  }

  test("every oracle's stopword IN-list matches the kernel's canonical list") {
    // pipe_text_corpus's oracle literal can't interpolate (its regex
    // anchors collide with s-string syntax), so pin it to the single
    // source of truth instead
    val canon = graft.functions.TextFunctions.stopwordsSqlList
    assert(SparkEntry.oracleSql("pipe_text_corpus").contains(canon),
      s"pipe_text_corpus oracle stopword list diverged from TextFunctions.stopwords: $canon")
    assert(SparkEntry.oracleSql("pipe_quality_funnel").contains(canon))
  }

  test("quality funnel: retention is monotone non-increasing and starts at 1.0") {
    val rows = SparkEntry.queries("pipe_quality_funnel")(spark, sf)
      .orderBy("stage_idx")
      .select("n_docs", "retention").as[(Long, Double)].collect()
    assert(rows.length == 5 && rows.head._2 == 1.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 <= a._1, s"funnel must be non-increasing: $a -> $b")
    }
    assert(rows.last._1 > 0, "some docs survive every stage at sf0.01")
  }

  test("domain mix: shares account for the whole corpus") {
    val m = SparkEntry.queries("pipe_domain_mix")(spark, sf)
      .select("n_docs", "pct_docs", "pct_tokens")
      .as[(Long, Double, Double)].collect()
    assert(m.map(_._1).sum == 500L)
    assert(math.abs(m.map(_._2).sum - 1.0) < 1e-4, "doc shares sum to ~1")
    assert(math.abs(m.map(_._3).sum - 1.0) < 1e-4, "token shares sum to ~1")
  }

  test("tfidf terms: a term unique to one doc outranks corpus-wide terms") {
    val dir = fixtureDir()
    writeDocs(dir, Seq(
      1L -> "shared words here plus zyzzyva",
      2L -> "shared words here plus filler",
      3L -> "shared words here plus filler"))
    val top = SparkEntry.queries("text_tfidf_terms")(spark, dir)
      .where(col("doc_id") === 1L).orderBy(col("score").desc, col("term"))
      .select("term").as[String].collect()
    assert(top.head == "zyzzyva", s"unique term must rank first, got ${top.toSeq}")
    // per-doc top-k bound holds
    val counts = SparkEntry.queries("text_tfidf_terms")(spark, dir)
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 3))
  }

  test("events funnel: strict event-time ordering, not mere presence") {
    val dir = fixtureDir()
    val t = (m: Int) => Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    Seq(
      // user 1: view < click < purchase -> reaches stage 2
      (1L, t(1), 1L, "view"), (2L, t(2), 1L, "click"), (3L, t(3), 1L, "purchase"),
      // user 2: purchase BEFORE click -> stops at stage 1
      (4L, t(1), 2L, "view"), (5L, t(2), 2L, "purchase"), (6L, t(3), 2L, "click"),
      // user 3: click BEFORE view -> stops at stage 0
      (7L, t(1), 3L, "click"), (8L, t(2), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_events_funnel")(spark, dir)
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 3L, "view_click" -> 2L, "view_click_purchase" -> 1L))
  }

  test("semantic dedup: exactly the brute-force pairs that share a cluster, nothing else") {
    val assign = SparkEntry.queries("dedup_semantic")(spark, sf)
      .select("vec_id", "cluster", "is_dup")
      .as[(Long, Long, Long)].collect()
    SparkEntry.releaseCaches()
    val cluster = assign.map(r => r._1 -> r._2).toMap
    val gotDups = assign.filter(_._3 == 1L).map(_._1).toSet
    // every cluster id is a centroid that assigned to ITSELF: its own
    // sim is exactly 1.0, which beats any other bucket-local candidate
    // (a round-6 tie would need an exact-duplicate centroid pair, absent
    // in the driver corpus)
    val clusterIds = cluster.values.toSet
    clusterIds.foreach(c => assert(cluster(c) == c, s"centroid $c not self-assigned"))
    // bucket-local centroids: strictly more clusters than the r10
    // global-K floor of 8 (sf0.01 → B=3 → 8 buckets × up to 4 centroids)
    assert(clusterIds.size > 8, s"expected >8 clusters, got ${clusterIds.size}")
    val brutePairs = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
      .select("i", "j").as[(Long, Long)].collect()
    SparkEntry.releaseCaches()
    val expected = brutePairs.collect {
      case (i, j) if cluster(i) == cluster(j) => j
    }.toSet
    assert(gotDups == expected,
      "is_dup must equal the within-cluster slice of the exact pair set")
    assert(expected.nonEmpty, "sf0.01 has intra-cluster near-dups by construction")
    assert(expected.size < brutePairs.map(_._2).toSet.size,
      "the recall trade is real: some brute pairs straddle clusters")
  }

  test("line dedup: keep-first by (doc_id, pos), reconstruction fingerprints the kept text") {
    import graft.functions.PolyHash64Expr
    val dir = fixtureDir()
    // 10-word segments so the fixture aligns with the segment unit
    val A = (1 to 10).map(i => s"aa$i").mkString(" ")
    val B = (1 to 10).map(i => s"bb$i").mkString(" ")
    val C = (1 to 10).map(i => s"cc$i").mkString(" ")
    val D = (1 to 10).map(i => s"dd$i").mkString(" ")
    val E = (1 to 10).map(i => s"ee$i").mkString(" ")
    writeDocs(dir, Seq(
      1L -> s"$A $B",            // both first occurrences → all kept
      2L -> s"$A $C",            // A already kept at doc 1 → only C survives
      3L -> B,                   // whole doc is a dup → reconstructs to ""
      4L -> s"$D $D",            // within-doc repeat → keep first copy only
      5L -> s"$E tail1 tail2"))  // trailing partial segment is its own line
    val got = SparkEntry.queries("text_line_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 2L, PolyHash64Expr.compute(s"$A $B"))))
    assert(got(2L) == ((2L, 1L, PolyHash64Expr.compute(C))))
    assert(got(3L) == ((1L, 0L, PolyHash64Expr.compute(""))))
    assert(got(4L) == ((2L, 1L, PolyHash64Expr.compute(D))))
    assert(got(5L) == ((2L, 2L, PolyHash64Expr.compute(s"$E tail1 tail2"))))
  }
}
