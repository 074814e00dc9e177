package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/** r12's Finding 4, promoted to a standing invariant (the
  * NanOrderingAuditSpec playbook, applied to plan shape). The failure
  * class: `InferFiltersFromGenerate` derives a `size(gs) > 0` filter
  * from an explode, and `PushDownPredicates` pushes it below the
  * Project that computed `gs` — SUBSTITUTING the alias's whole
  * expression (tokenize + gram lambda) into the filter condition.
  * Higher-order functions are CodegenFallback, so the pushed copy runs
  * interpreted; worse, when the filter lands below a Generate it runs
  * once per GENERATED row, re-splitting the document per gram —
  * O(tokens²) per document. Invisible on normal docs; a 2M-token doc
  * ground one task for >15 minutes (r12, pipe_decontaminate's gram
  * pipeline). The fix class is kernel-level — one primitive UDF
  * (wordGramsDistinct / wordShingleHashes) makes every planner copy
  * O(tokens) — and this spec keeps the NEXT text query from
  * reintroducing the declarative shape.
  *
  * Mechanics: walk every registered query's OPTIMIZED logical plan
  * (what actually executes — pushdown has already happened there) and
  * flag any Filter whose condition contains a tokenizer split or an
  * interpreted higher-order lambda. Both are cheap per evaluation on
  * the surface, and both are exactly what the optimizer duplicates
  * into per-row hot paths. An allowlist entry must name the spec
  * holding the evidence that a flagged site is linear.
  */
class PushdownQuadraticAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Offending (queryName, description) pairs in a plan: Filters whose
    * condition re-tokenizes (StringSplit) or runs an interpreted
    * lambda (HigherOrderFunction — always CodegenFallback). */
  private def offenses(plan: LogicalPlan): Seq[String] = {
    val hits = Seq.newBuilder[String]
    def scan(e: Expression): Unit = {
      e match {
        case s: StringSplit =>
          hits += s"split() in a Filter condition: ${s.toString.take(160)}"
        case h: HigherOrderFunction =>
          hits += s"interpreted higher-order lambda in a Filter condition: ${h.toString.take(160)}"
        case _ =>
      }
      e.children.foreach(scan)
    }
    plan.foreach {
      case f: Filter => scan(f.condition)
      case _         =>
    }
    hits.result()
  }

  /** Queries whose flagged site is justified linear; every entry must
    * name the spec holding the evidence (a bare claim doesn't count). */
  private val allowlisted: Map[String, String] = Map.empty

  test("no registered query's optimized plan re-tokenizes or runs a lambda inside a Filter") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val found =
        try offenses(fn(spark, sf).queryExecution.optimizedPlan)
        finally SparkEntry.releaseCaches()
      if (found.nonEmpty && !allowlisted.contains(name))
        Seq(s"$name:\n  ${found.mkString("\n  ")}")
      else Nil
    }
    assert(bad.isEmpty,
      s"""${bad.size} quer${if (bad.size == 1) "y" else "ies"} carry a tokenizer/lambda inside an
         |optimized-plan Filter — the r12 O(tokens²) pushdown class. Make the array pipeline ONE
         |primitive UDF (the wordGramsDistinct fix class) so every planner copy is O(tokens), or
         |add an allowlist entry naming the spec that proves the site linear (SOAK_HOT_DOC axis):
         |${bad.mkString("\n")}""".stripMargin)
  }

  test("allowlist entries stay live and name their evidence") {
    allowlisted.foreach { case (name, why) =>
      assert(SparkEntry.queries.contains(name),
        s"allowlist entry $name is not a registered query — remove it")
      assert(why.contains("Spec") || why.contains("HOT_DOC"),
        s"allowlist entry $name must name the spec or soak axis holding its evidence")
    }
  }

  test("the detector fires on the reverted docGrams shape (planted defect)") {
    import org.apache.spark.sql.functions._
    // the EXACT r12 defect: tokenize in one Project, gram-ify with a
    // transform lambda in the next, explode. InferFiltersFromGenerate +
    // PushDownPredicates copy the inferred size(gs)>0 filter below the
    // Projects, substituting BOTH aliases — the optimized plan's Filter
    // then contains split() inside an interpreted lambda, the
    // O(tokens²) shape. If Spark ever stops pushing it, the planted
    // plan goes clean and this canary fails — at which point the audit
    // can be retired, not silently blinded.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("toks"))
    val grams = toks.select(col("doc_id"),
      transform(sequence(lit(1), greatest(size(col("toks")) - 2, lit(0))),
        i => concat_ws(" ", slice(col("toks"), i, lit(3)))).as("gs"))
    val exploded = grams.select(col("doc_id"), explode(col("gs")).as("g"))
    val found = offenses(exploded.queryExecution.optimizedPlan)
    assert(found.nonEmpty,
      "the planted docGrams revert produced a clean plan — either the optimizer no longer " +
        "pushes inferred Generate filters (retire this audit deliberately) or the detector " +
        "regressed and the suite is blind")
    assert(found.exists(_.contains("split")) || found.exists(_.contains("lambda")),
      s"detector fired but not on the planted shape: $found")
  }
}
