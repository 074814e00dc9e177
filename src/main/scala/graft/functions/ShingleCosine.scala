package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** P15 as a native Catalyst expression with codegen: cosine similarity
  * of the char-k-shingle count profiles of two strings (the reference's
  * info.debatty Cosine(k),
  * /root/reference/src/scipi/src/main/java/batch/ScipiBatchAssociation.java:109-142).
  *
  * Why an Expression and not a UDF/column composition: the nested
  * higher-order column version walks both gram arrays per distinct gram
  * (interpreted, no codegen); a UDF pays per-row closure + encoder
  * overhead. This codegen's to a static call inlined in the generated
  * code, keeping the whole stage in one compiled loop.
  *
  * Exact same arithmetic as the columnar formulation: all profile sums
  * in Long, one double division at the end — so results are
  * bit-identical to the DuckDB oracle.
  */
case class ShingleCosineExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "shingle_cosine"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleCosineExpr.compute(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleCosineExpr.compute($a.toString(), $b.toString(), $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleCosineExpr {

  /** Column-API entry point. */
  def apply(a: Column, b: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleCosineExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), k))

  /** Static kernel the generated code calls (Scala static forwarder). */
  def compute(a: String, b: String, k: Int): Double = {
    val pa = profile(a, k)
    val pb = profile(b, k)
    if (pa.isEmpty || pb.isEmpty) return 0.0
    var dot = 0L; var na = 0L; var nb = 0L
    val ita = pa.entrySet().iterator()
    while (ita.hasNext) {
      val e = ita.next()
      val ca = e.getValue.toLong
      na += ca * ca
      val cb = pb.get(e.getKey)
      if (cb != null) dot += ca * cb.toLong
    }
    val itb = pb.values().iterator()
    while (itb.hasNext) { val c = itb.next().toLong; nb += c * c }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  private def profile(s: String, k: Int): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i <= s.length - k) {
      val g = s.substring(i, i + k)
      val prev = m.get(g)
      m.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    m
  }
}
