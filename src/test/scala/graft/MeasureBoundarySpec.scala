package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The measure-column read boundary (Tables.sanMeasures) end to end —
  * the r14 regression class, each arm red before the r15 fix:
  *
  *  1. narrow parquet: `Tables.lineitem` on a file missing measure
  *     columns crashed UNRESOLVED_COLUMN (sanitization must be
  *     schema-aware);
  *  2. pushdown: a measure predicate must reach the parquet scan as a
  *     raw-column PushedFilter even though the consumer filters on the
  *     sanitizing CASE (graft.plans.SanitizedMeasurePushdown);
  *  3. semantics ON dirty data: with NaN/±Inf/NULL planted in the
  *     measure column, the pushdown-restored filter must keep exactly
  *     the finite in-range rows — i.e. the raw conjunct the rule adds
  *     never rescues a row the sanitized predicate drops (Spark's
  *     NaN-greatest comparison semantics are the trap: raw
  *     `NaN >= 0.03` is TRUE), and parquet row-group pruning over
  *     min/max stats that ignore NaN never skips a surviving row.
  */
class MeasureBoundarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = s"/tmp/graft_measure_boundary_${suiteName.hashCode}"

  test("narrow parquet without measure columns reads through Tables.lineitem") {
    Seq((1L, "R"), (2L, "A")).toDF("l_orderkey", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/narrow/lineitem.parquet")
    val out = Tables.lineitem(spark, s"$dir/narrow").collect()
    assert(out.length == 2, "narrow lineitem must read as-is (schema-aware boundary)")
  }

  private def dirtyLineitem(): String = {
    val rows = Seq(
      (1L, 5.0), (2L, 23.9), (3L, 24.0), (4L, Double.NaN),
      (5L, Double.PositiveInfinity), (6L, Double.NegativeInfinity),
      (8L, 30.0)).toDF("l_orderkey", "l_quantity")
      .union(Seq(7L).toDF("l_orderkey")
        .withColumn("l_quantity", lit(null).cast("double")))
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/dirty/lineitem.parquet")
    s"$dir/dirty"
  }

  test("dirty measures: literal filter keeps exactly the finite in-range rows, pushdown restored") {
    val d = dirtyLineitem()
    val q = Tables.lineitem(spark, d).where(col("l_quantity") < 24)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("LessThan(l_quantity,24.0)"),
      s"raw measure predicate not pushed to the scan:\n$plan")
    assert(plan.contains("IsNotNull(l_quantity)"),
      s"implied IsNotNull not pushed to the scan:\n$plan")
    // NaN (raw `NaN < 24` pushes nothing but Spark's NaN-greatest would
    // keep it under >=-shaped predicates), ±Inf and NULL must all drop;
    // -Inf is the discriminating row: raw `-Inf < 24` is TRUE, only the
    // sanitized conjunct drops it
    assert(q.select("l_orderkey").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "sanitized < keeps only finite in-range rows")
    val ge = Tables.lineitem(spark, d).where(col("l_quantity") >= 5)
    // +Inf and NaN both satisfy the RAW >= under Spark comparison
    // semantics — the sanitized conjunct must still drop them
    assert(ge.select("l_orderkey").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 8L),
      "sanitized >= never rescued by the raw pushdown conjunct")
  }

  test("dirty measures: non-foldable comparison (scalar cutoff) gets its IsNotNull pushed") {
    val d = dirtyLineitem()
    val cut = Tables.lineitem(spark, d)
      .agg(lit(20.0).as("cutoff"))
    val q = Tables.lineitem(spark, d).crossJoin(broadcast(cut))
      .where(col("l_quantity") > col("cutoff"))
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("IsNotNull(l_quantity)"),
      s"IsNotNull not inferred through the value-form CASE:\n$plan")
    assert(q.select("l_orderkey").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 8L),
      "cutoff comparison drops NaN/Inf/null rows on both branches")
  }

  test("sanitize-guarded CASE with a THROWING else keeps its guard (lift safe by construction)") {
    import org.apache.spark.sql.catalyst.expressions.{And, CaseWhen, Cast, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val d = dirtyLineitem()
    // The exact false-branch CASE shape the lift matches, but the else
    // is an ANSI-throwing expression (double→int cast: NaN throws).
    // r16's rule lifted ANY deterministic else past the guard — safe
    // only because originals-first + And short-circuit happened to
    // evaluate the guard first, an ordering later passes are free to
    // undo. r17 requires a provably non-throwing else: this CASE must
    // arrive at the filter intact, with NO bare cast conjunct beside it.
    // read the parquet RAW so the guard sits over the bare scan
    // attribute — through Tables.lineitem the guard would wrap the
    // boundary CASE alias and SanitizeGuard (attribute-only) never
    // matches, which would make this fixture vacuously green
    val q = spark.read.parquet(s"$d/lineitem.parquet")
      .where(when(isnan(col("l_quantity")) ||
          abs(col("l_quantity")) === Double.PositiveInfinity, lit(false))
        .otherwise(col("l_quantity").cast("int") === 5))
    def conj(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conj(l) ++ conj(r)
      case x => Seq(x)
    }
    val conjuncts = q.queryExecution.optimizedPlan
      .collect { case f: LFilter => f }.flatMap(f => conj(f.condition))
    val liftedCasts = conjuncts.filter(c =>
      c.exists(_.isInstanceOf[Cast]) && !c.exists(_.isInstanceOf[CaseWhen]))
    assert(liftedCasts.isEmpty,
      s"throwing else lifted past its sanitize guard: $liftedCasts")
    // the guard still does its job: garbage rows drop, no ANSI throw
    assert(q.select("l_orderkey").as[Long].collect().toSeq == Seq(1L),
      "guarded throwing else evaluates only on finite rows")
  }

  test("dirty measures: aggregates skip the sanitized garbage like SQL NULLs") {
    val d = dirtyLineitem()
    val r = Tables.lineitem(spark, d)
      .agg(sum("l_quantity").as("s"), count(col("l_quantity")).as("n"),
        count(lit(1)).as("total"))
      .as[(Double, Long, Long)].head()
    assert(r._1 == 5.0 + 23.9 + 24.0 + 30.0, "sum skips NaN/Inf/null")
    assert(r._2 == 4L, "count(col) skips the four garbage rows")
    assert(r._3 == 8L, "count(*) still sees every row — boundary nulls, never drops")
  }
}
