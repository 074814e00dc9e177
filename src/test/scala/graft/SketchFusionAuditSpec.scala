package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

/** r13 §4b/§9f, promoted to a standing invariant (the
  * PushdownQuadraticAuditSpec playbook). The failure class: fusing a
  * DISTINCT aggregate with a buffer-heavy sketch aggregate in ONE
  * Aggregate node. The distinct rewrite (Expand, or the one-distinct
  * partial keyed by group+distinct column) then threads the sketch's
  * aggregation buffer — 16 KB of HLL registers at rsd=0.01, a GK
  * percentile sketch, a CMS table, or an unbounded collect buffer —
  * through every intermediate (group, distinctValue) combination:
  * millions of buffer allocations/merges instead of one per output
  * group. It cost q_events_hau_approx 16–27× and
  * q_approx_distinct_users 2.4× before each was reshaped to run the
  * sketch and the exact count as separate aggregations (over a
  * pre-distincted projection, or joined on the tiny group axis). This
  * spec keeps the NEXT certificate query from reintroducing the
  * fusion.
  *
  * Mechanics: walk every registered query's ANALYZED plan (the user's
  * shape, before the rewrite disguises it as Expand + multi-stage
  * aggregates) and flag any Aggregate carrying both an
  * isDistinct aggregate and a sketch/collect aggregate. An allowlist
  * entry must name the spec or ladder holding the evidence that a
  * flagged fusion is harmless (e.g. the distinct column is
  * group-functional so the intermediate blowup cannot occur).
  */
class SketchFusionAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Aggregate functions whose per-group buffer is large or unbounded —
    * the ones the distinct rewrite must never replicate per
    * (group, distinctValue). */
  private val SketchAggs = Set(
    "approx_count_distinct", // HLL++: 2^14 registers at rsd 0.01
    "approx_percentile", "percentile_approx", // GK sketch
    "count_min_sketch",
    "bloom_filter_agg",
    "collect_list", "collect_set", // unbounded
    "hll_sketch_agg", "kll_sketch_agg")

  private def offenses(plan: LogicalPlan): Seq[String] =
    plan.collect { case a: Aggregate =>
      val aggs = a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
      val distincts = aggs.filter(_.isDistinct)
      val sketches = aggs.filter(ae =>
        SketchAggs.contains(ae.aggregateFunction.prettyName))
      if (distincts.nonEmpty && sketches.nonEmpty)
        Seq("DISTINCT agg (" +
          distincts.map(_.aggregateFunction.prettyName).distinct.mkString(",") +
          ") fused with buffer agg (" +
          sketches.map(_.aggregateFunction.prettyName).distinct.mkString(",") +
          ") in one Aggregate")
      else Nil
    }.flatten

  /** Queries whose flagged fusion is justified; every entry must name
    * the spec/ladder holding the evidence (a bare claim doesn't count). */
  private val allowlisted: Map[String, String] = Map.empty

  test("no registered query fuses a DISTINCT aggregate with a sketch/collect buffer") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val found =
        try offenses(fn(spark, sf).queryExecution.analyzed)
        finally SparkEntry.releaseCaches()
      if (found.nonEmpty && !allowlisted.contains(name))
        Seq(s"$name:\n  ${found.mkString("\n  ")}")
      else Nil
    }
    assert(bad.isEmpty,
      s"""${bad.size} quer${if (bad.size == 1) "y" else "ies"} fuse a DISTINCT aggregate with a
         |sketch/collect buffer — the r13 §4b class: the distinct rewrite threads the buffer
         |through every (group, distinctValue) intermediate. Run the sketch and the exact count
         |as separate aggregations (sketches are multiplicity-insensitive — compute both over a
         |pre-distincted projection, the q_approx_distinct_users fix), or add an allowlist entry
         |naming the evidence:
         |${bad.mkString("\n")}""".stripMargin)
  }

  test("allowlist entries stay live and name their evidence") {
    allowlisted.foreach { case (name, why) =>
      assert(SparkEntry.queries.contains(name),
        s"allowlist entry $name is not a registered query — remove it")
      assert(why.contains("Spec") || why.contains("ladder"),
        s"allowlist entry $name must name the spec or ladder holding its evidence")
    }
  }

  test("the detector fires on the reverted q_approx_distinct_users shape (planted defect)") {
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet(s"$sf/events.parquet")
    val fused = events.groupBy("event_type").agg(
      approx_count_distinct(col("user_id"), rsd = 0.01).as("approx"),
      countDistinct(col("user_id")).as("n_users_exact"))
    val found = offenses(fused.queryExecution.analyzed)
    assert(found.nonEmpty,
      "the planted fused shape produced a clean analyzed plan — the detector regressed " +
        "and the suite is blind to the §4b class")
    assert(found.exists(_.contains("approx_count_distinct")),
      s"detector fired but not on the planted shape: $found")
  }
}
