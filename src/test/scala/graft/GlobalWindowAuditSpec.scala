package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** r13 VERDICT #6, promoted to a standing invariant (the
  * PushdownQuadratic / SketchFusion playbook). The failure class: a
  * window function with NO partition spec plans a single-partition
  * WindowExec — every row of the input funnels through ONE task, the
  * definition of a scale-killer at 100 TB (Spark itself warns
  * `WindowExec: No Partition Defined ... serious performance
  * degradation`). The CURRENT sites are all provably bounded (a
  * calendar-day axis, a ≤K-row head after a limit) — the audit exists
  * so the NEXT partition-less window needs a named boundedness proof
  * instead of riding in silently.
  *
  * Mechanics: walk every registered query's OPTIMIZED logical plan and
  * flag any `Window` node whose partitionSpec is empty. An allowlist
  * entry must NAME the bound (what axis limits the rows reaching the
  * window) — a bare "it's fine" doesn't count, and entries for
  * unregistered queries fail so the list can't rot.
  */
class GlobalWindowAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def offenses(plan: LogicalPlan): Seq[String] = {
    val hits = Seq.newBuilder[String]
    plan.foreach {
      case w: Window if w.partitionSpec.isEmpty =>
        hits += s"partition-less Window: ${w.windowExpressions.map(_.sql).mkString(", ").take(200)}"
      case _ =>
    }
    hits.result()
  }

  /** Queries whose global window is justified bounded; every entry
    * names the axis that bounds the window's input (verified against
    * the code: each window sits directly above a groupBy census or a
    * LIMIT, never above row-cardinality data). */
  private val allowlisted: Map[String, String] = Map(
    "pipe_compaction_plan" -> ("cumulative sum over the (source, lang) shard census — " +
      "input bounded by the domain axis (one row per source×lang aggregate group)"),
    "pipe_domain_mix" -> ("grand-total over the per-source domain census — " +
      "input bounded by the source axis (groupBy aggregate, one row per domain)"),
    "pipe_quality_funnel" -> ("max over the funnel-stage census — " +
      "input bounded by the fixed stage list (one row per filter stage)"),
    "pipe_token_budget" -> ("quota grand-total over the per-source census — " +
      "input bounded by the source axis (groupBy aggregate, one row per domain)"),
    "pipe_vocab_coverage" -> ("rank/cumsum run above LIMIT 25 — " +
      "input bounded at ≤25 rows by the explicit head"),
    "q_cum_order_dist" -> ("grand-total over the order-size-pattern census — " +
      "input bounded by the basket-size axis (one row per distinct item count)"),
    "q_orders_backlog" -> ("calendar cumsum over the per-day open/close census — " +
      "input bounded by the day axis (one row per calendar day)"))

  test("no registered query's optimized plan windows without a partition, unless its bound is named") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val found =
        try offenses(fn(spark, sf).queryExecution.optimizedPlan)
        finally SparkEntry.releaseCaches()
      if (found.nonEmpty && !allowlisted.contains(name))
        Seq(s"$name:\n  ${found.mkString("\n  ")}")
      else Nil
    }
    assert(bad.isEmpty,
      s"""${bad.size} quer${if (bad.size == 1) "y" else "ies"} plan a partition-less Window — a
         |single-task funnel at scale. Partition the window, bound its input, or add an allowlist
         |entry NAMING the axis that bounds the rows reaching it:
         |${bad.mkString("\n")}""".stripMargin)
  }

  test("allowlist entries stay live and name their bound") {
    allowlisted.foreach { case (name, why) =>
      assert(SparkEntry.queries.contains(name),
        s"allowlist entry $name is not a registered query — remove it")
      assert(why.matches(".*(≤|<=|bounded|axis|LIMIT|limit|head).*"),
        s"allowlist entry $name must name what bounds the window's input: $why")
    }
  }

  test("the detector fires on an unbounded global window (planted defect)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = docs.withColumn("rn",
      row_number().over(W.orderBy(col("doc_id"))))
    val found = offenses(planted.queryExecution.optimizedPlan)
    assert(found.nonEmpty,
      "the planted global row_number produced a clean plan — detector regressed, suite is blind")
  }
}
