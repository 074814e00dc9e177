package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash (base 31, wrapping Long arithmetic)
  * of a string, as a native codegen'd Catalyst expression.
  *
  * Why this and not `xxhash64`: the two are interchangeable as content
  * fingerprints (order-sensitive, 64-bit), but the poly hash is exactly
  * reproducible in plain SQL via 128-bit mod-2^64 arithmetic, so the
  * fingerprint query gets a hard value-level oracle instead of a
  * rows-only check. Wrapping multiplication lives in JVM code, outside
  * ANSI-mode overflow checks; `doGenCode` inlines a static call so the
  * whole stage stays in one compiled loop.
  */
case class PolyHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def nullSafeEval(s: Any): Any =
    PolyHash64Expr.compute(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.PolyHash64Expr.compute($s.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash64Expr {

  /** Same seed as the shingle/feature kernels (a large prime). */
  val Seed = 1125899906842597L

  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(PolyHash64Expr(GraftColumnBridge.expression(c)))

  /** Static kernel the generated code calls: h = h*31 + codePoint,
    * wrapping. Iterates CODE POINTS, not UTF-16 chars: the DuckDB
    * oracle folds `ord(substr(s, i, 1))` over `length(s)` positions,
    * and both of those are code-point-based — a charAt loop diverges
    * on any astral-plane character (emoji, math alphanumerics), which
    * is exactly what the r13 unicode-injection axis caught. For ASCII
    * (and all BMP) input the two loops are identical, so committed
    * hash values are unchanged. */
  def compute(s: String): Long = {
    var h = Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = h * 31 + cp
      i += Character.charCount(cp)
    }
    h
  }
}
