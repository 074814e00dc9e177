package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.LevenshteinBandRule

/** Pins the levenshtein band/threshold optimizer rule: the rewrite
  * fires where it should (filter conditions, cast-wrapped forms), never
  * where it must not (projections), changes no results (nulls and
  * boundary distances included), and is idempotent under the
  * fixed-point batch. */
class OptimizerRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // lengths 5/5/6/2 + null: covers dist <= k, dist > k at equal length
  // (banded DP -1 path), length diff > k (band short-circuit), null
  private val names = Seq("alpha", "aloha", "alphas", "be", null)

  // SparkTestSession comes from GraftSession.get, which registers the
  // rule — so the SHARED session is rule-ON by default, and honest
  // baselines must strip it (a rule-on-vs-rule-on comparison is
  // vacuous and would certify a semantically wrong rewrite).
  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    if (!prev.contains(LevenshteinBandRule))
      spark.experimental.extraOptimizations = prev :+ LevenshteinBandRule
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def withoutRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev.filterNot(_ == LevenshteinBandRule)
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def pairs = {
    import spark.implicits._
    names.toDF("n").as("a").crossJoin(names.toDF("m").as("b"))
  }

  test("rewrite fires on filter conditions (bare and cast-wrapped) and preserves results") {
    import spark.implicits._
    def direct = pairs.where(levenshtein(col("n"), col("m")) <= 2)
      .select("n", "m")
    def casted = pairs.where(levenshtein(col("n"), col("m")).cast("long") < 3)
      .select("n", "m")
    val base = withoutRule {
      val p0 = direct.queryExecution.optimizedPlan.toString
      assert(!p0.contains("Some(2)"), s"baseline must be rule-free:\n$p0")
      (direct.as[(String, String)].collect().toSet,
        casted.as[(String, String)].collect().toSet)
    }
    withRule {
      val p = direct.queryExecution.optimizedPlan.toString
      assert(p.contains("Some(2)) >= 0"), s"threshold form missing:\n$p")
      assert(p.contains("abs((length(n"), s"length band missing:\n$p")
      val pc = casted.queryExecution.optimizedPlan.toString
      assert(pc.contains("Some(2)) >= 0"), s"cast/strict form not rewritten:\n$pc")
      assert(direct.as[(String, String)].collect().toSet == base._1)
      assert(casted.as[(String, String)].collect().toSet == base._2)
    }
  }

  test("narrowing casts are NOT rewritten: byte/short overflow semantics preserved") {
    // `cast(lev as byte/short)` is lossy — a distance > 127/32767
    // throws CAST_OVERFLOW under ANSI (Spark 4 default) or wraps
    // negative under non-ANSI, while the band+threshold form would
    // quietly return FALSE. Either way the rewrite would CHANGE the
    // observable behavior, so the rule must leave the predicate alone
    // (r9 ADVICE, medium). Rule applied to the analyzed plan directly:
    // the full optimizer would eagerly evaluate the LocalRelation and
    // throw before we could inspect anything.
    import spark.implicits._
    val long = "x" * 300 // lev vs "" = 300 > Byte.MaxValue
    def narrowed(t: String) = Seq((long, "")).toDF("n", "m")
      .where(levenshtein(col("n"), col("m")).cast(t) <= 100)
    Seq("byte", "short").foreach { t =>
      val plan = narrowed(t).queryExecution.analyzed
      assert(LevenshteinBandRule(plan).fastEquals(plan),
        s"narrowing $t cast must not rewrite")
    }
    // and the preserved behavior is the ANSI overflow error, which the
    // band form would have swallowed into FALSE
    withRule {
      val e = intercept[Exception] { narrowed("byte").collect() }
      assert(e.getMessage.contains("CAST_OVERFLOW"), e.getMessage)
    }
    // widening long cast still fires (the supported DataFrame shape);
    // typed lit so the analyzed plan carries a bare long literal (the
    // optimizer path would constant-fold an int literal's cast anyway)
    val wide = Seq((long, "")).toDF("n", "m")
      .where(levenshtein(col("n"), col("m")).cast("long") <= lit(100L))
      .queryExecution.analyzed
    assert(!LevenshteinBandRule(wide).fastEquals(wide),
      "widening cast stopped firing")
  }

  test("projections are NOT rewritten: edit_dist keeps the true distance") {
    import spark.implicits._
    def q = pairs
      .select(col("n"), col("m"),
        levenshtein(col("n"), col("m")).cast("long").as("edit_dist"))
      .where(col("edit_dist") <= 2)
    val base = withoutRule { q.as[(String, String, Long)].collect().toSet }
    withRule {
      val got = q.as[(String, String, Long)].collect().toSet
      assert(got == base, "projected distances or survivors changed")
      // the far-but-same-length pair would read -1 if the projection
      // had been thresholded
      assert(got.forall(_._3 >= 0L))
    }
  }

  test("idempotent: a second application leaves the plan unchanged") {
    val plan = pairs.where(levenshtein(col("n"), col("m")) <= 2)
      .queryExecution.analyzed
    val once = LevenshteinBandRule(plan)
    val twice = LevenshteinBandRule(once)
    assert(once.fastEquals(twice), "rule is not a fixed point")
    assert(!once.fastEquals(plan), "rule did not fire at all")
  }

  test("ER queries stay correct under the rule (the Verify session wiring)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    def run() = SparkEntry.queries("q_fuzzy_name_pairs")(spark, sf)
      .as[(String, String, Long)].collect().toSet
    val base = withoutRule { run() }
    val got = withRule { run() }
    SparkEntry.releaseCaches()
    assert(base.nonEmpty && got == base)
  }
}
