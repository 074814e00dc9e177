package graft

import org.scalatest.funsuite.AnyFunSuite

/** r11's manual NaN-ordering audit, promoted to a standing invariant
  * (r11 VERDICT #6). The failure class: Spark SQL and DuckDB both
  * order NaN ABOVE every number, so `sim >= t` PASSES a zero vector's
  * 0/0 cosine in both engines — while a Scala/IEEE kernel comparison
  * (`if (sim >= t)`) correctly fails it. A query pairing a Scala
  * kernel with a SQL oracle therefore diverges silently the first
  * time a zero vector appears, and the r11 audit caught exactly one
  * such latent divergence (dedup_embedding_cosine) plus one live one
  * (the semantic decon screen) — both now guarded with explicit
  * `isnan` exclusions on BOTH sides.
  *
  * This spec keeps the class closed mechanically as new queries land:
  * it derives the at-risk family from the committed oracle SQL itself
  * (a division by sqrt(...) is the only ratio on the surface whose
  * denominator can be exactly +0.0 — jaccard/containment/contamination
  * denominators are counts of non-empty sets, >= 1 by construction),
  * and fails any family member that neither excludes NaN explicitly
  * nor carries an allowlist entry naming the planted fixture / the
  * structural reason NaN cannot reach its threshold. A new cosine
  * query with a bare `>= t` fails here on the day it is written.
  */
class NanOrderingAuditSpec extends AnyFunSuite {

  private def norm(sql: String) = sql.toLowerCase.replaceAll("\\s+", " ")

  /** Oracles computing a cosine-shaped ratio: any division by sqrt. */
  private val cosineFamily: Map[String, String] =
    SparkEntry.oracleSql.filter { case (_, sql) =>
      norm(sql).matches(".*/ ?sqrt ?\\(.*")
    }

  /** The at-risk subset: family members whose oracle also applies a
    * `>=` threshold anywhere (over-approximate on purpose — a `>=` on
    * an unrelated column still forces a justification, the
    * conservative direction). */
  private val thresholded: Map[String, String] =
    cosineFamily.filter { case (_, sql) => norm(sql).contains(">=") }

  /** Family members with no oracle `isnan` guard, each justified by
    * the planted fixture or structural argument that keeps NaN away
    * from the threshold. Every justification must name the spec
    * holding the evidence — a bare claim doesn't count. */
  private val allowlisted: Map[String, String] = Map(
    "dedup_learned_semantic" ->
      ("the cosine denominator is sqrt(na*nb) over integer norms filtered positive on BOTH " +
        "engines (nsq > 0 in Spark, HAVING sum(s*s) > 0 in the oracle's shared n CTE), so " +
        "NaN is structurally unreachable; the zero-norm (all-OOV doc) regime is planted in " +
        "NanOrderingAuditSpec's learned-tier fixture test"))

  test("the audit's family detection is live (the known guarded members are found)") {
    // the two r11 fixes must be IN the family and guarded — if the
    // regex ever stops matching their oracles, the audit is blind and
    // this canary fails before a real regression can hide
    Seq("dedup_embedding_cosine", "pipe_decontaminate_semantic").foreach { name =>
      assert(thresholded.contains(name), s"$name left the detected family — audit regex is stale")
      assert(norm(thresholded(name)).contains("isnan"), s"$name lost its oracle NaN guard")
    }
    assert(cosineFamily.size >= 4, s"cosine family suspiciously small: ${cosineFamily.keys}")
  }

  test("every thresholded cosine oracle excludes NaN explicitly or is allowlisted with evidence") {
    val unguarded = thresholded.collect {
      case (name, sql) if !norm(sql).contains("isnan") && !allowlisted.contains(name) => name
    }
    assert(unguarded.isEmpty,
      s"queries ${unguarded.toSeq.sorted} compute a cosine (division by sqrt) and apply a >= " +
        "threshold, but their oracles neither exclude NaN explicitly (NOT isnan(...)) nor " +
        "carry a NanOrderingAuditSpec allowlist entry naming a planted zero-vector fixture. " +
        "SQL engines order NaN above every number, so an unguarded threshold silently " +
        "diverges from any Scala kernel the first time a zero vector appears.")
  }

  test("allowlist entries stay live and name their evidence") {
    allowlisted.foreach { case (name, why) =>
      assert(thresholded.contains(name),
        s"allowlist entry $name is no longer in the thresholded cosine family — remove it")
      assert(why.contains("Spec"),
        s"allowlist entry $name must name the spec holding its planted fixture or pin")
      assert(!norm(thresholded(name)).contains("isnan"),
        s"allowlist entry $name is already isnan-guarded — remove the redundant entry")
    }
  }

  lazy val spark = SparkTestSession.spark

  test("planted zero vector: dedup_semantic never marks a NaN cosine as a duplicate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a real near-dup pair (assert the fixture exercises the dup path)
    // plus a zero vector, whose cosine to EVERY cluster peer is 0/0 =
    // NaN — before the guard, both engines ordered NaN above the
    // threshold and flagged it a dup of its whole cluster
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else 0.25f)
    val dir = s"/tmp/graft_nan_semantic_${suiteName.hashCode}"
    Seq(0L -> Array.fill(64)(0.0f), 1L -> v, 2L -> v)
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("dedup_semantic")(spark, dir)
      .select("vec_id", "is_dup").as[(Long, Long)].collect().toMap
    SparkEntry.releaseCaches()
    assert(out.keySet == Set(0L, 1L, 2L), "census must keep every vector, including the zero one")
    assert(out(0L) == 0L, "a zero vector's NaN cosine is not a duplicate")
    assert(out(1L) == 0L && out(2L) == 1L,
      "the identical pair must still dedup (later vec_id marked) — fixture exercises the dup path")
  }

  test("planted all-OOV doc: dedup_learned_semantic's zero-norm guard holds (no NaN, doc leaves the census)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocabTokens = graft.functions.EmbeddingVectors.Vectors.map(_._1).toSet
    val inVocab = graft.functions.EmbeddingVectors.Vectors.take(6).map(_._1).mkString(" ")
    val oov = "qqqzzz wwwxxx yyyvvv"
    assert(oov.split(" ").forall(t => !vocabTokens.contains(t)), "fixture tokens must be OOV")
    val dir = s"/tmp/graft_nan_learned_${suiteName.hashCode}"
    Seq((1L, inVocab, "s1"), (2L, inVocab, "s1"), (3L, oov, "s2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_learned_semantic")(spark, dir)
      .agg(sum("n_docs"), sum("n_dup_pairs")).as[(Long, Long)].head()
    SparkEntry.releaseCaches()
    assert(out._1 == 2L,
      s"the all-OOV doc has no positive-norm vector and must leave the census, got ${out._1} docs")
    assert(out._2 == 1L,
      s"the identical in-vocab pair must still count as the one dup pair, got ${out._2}")
  }
}
