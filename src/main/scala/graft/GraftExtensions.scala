package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.ShingleCosineExpr

/** Session extension registering graft's custom expressions as SQL
  * functions, so the SQL string interface reaches them too:
  *
  *   spark.sql("SELECT shingle_cosine(keyword, title) ...")
  *
  * Deploy on a cluster with
  * `--conf spark.sql.extensions=graft.GraftExtensions`; for an already-
  * built session use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.shingleCosine)
    ext.injectFunction(GraftExtensions.polyHash64)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    ext.injectOptimizerRule(_ => graft.plans.SanitizedMeasurePushdown)
  }
}

object GraftExtensions {

  private val shingleCosine = (
    new FunctionIdentifier("shingle_cosine"),
    new ExpressionInfo(classOf[ShingleCosineExpr].getName, "shingle_cosine"),
    (children: Seq[Expression]) =>
      children match {
        case Seq(a, b) => ShingleCosineExpr(a, b, 3)
        case Seq(a, b, Literal(k: Int, _)) => ShingleCosineExpr(a, b, k)
        case _ => throw new IllegalArgumentException(
          "shingle_cosine(str, str[, k literal]) expected")
      })

  private val polyHash64 = (
    new FunctionIdentifier("poly_hash64"),
    new ExpressionInfo(classOf[graft.functions.PolyHash64Expr].getName, "poly_hash64"),
    (children: Seq[Expression]) =>
      children match {
        case Seq(a) => graft.functions.PolyHash64Expr(a)
        case _ => throw new IllegalArgumentException("poly_hash64(str) expected")
      })

  def register(spark: SparkSession): Unit = {
    Seq(shingleCosine, polyHash64).foreach { f =>
      spark.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3)
    }
    // post-hoc optimizer injection for an already-built session (the
    // builder path uses injectOptimizerRule instead); idempotent
    Seq(graft.plans.LevenshteinBandRule, graft.plans.SanitizedMeasurePushdown)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      }
  }
}
