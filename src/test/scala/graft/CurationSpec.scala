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
