package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * For a KNOWN dimension the dot product is unrolled into a flat
  * arithmetic expression over `GetArrayItem`s — that keeps it inside
  * whole-stage codegen (higher-order `aggregate`/`zip_with` lambdas are
  * interpreted per row, an order of magnitude slower on the O(n²)
  * similarity joins). Elements are cast to double before multiplying and
  * summed left-to-right in index order, so any engine that follows the
  * same order (the DuckDB oracles are written term-by-term) matches
  * bit-for-bit.
  */
object VectorFunctions {

  /** Σ a[i]*b[i], unrolled, double math, index order. */
  def dotExpr(a: Column, b: Column, dim: Int): Column =
    (0 until dim)
      .map(i => a.getItem(i).cast("double") * b.getItem(i).cast("double"))
      .reduce(_ + _)

  /** Σ a[i]^2, unrolled. */
  def normSqExpr(a: Column, dim: Int): Column = dotExpr(a, a, dim)

  /** Cosine similarity, unrolled for `dim`. */
  def cosineExpr(a: Column, b: Column, dim: Int): Column =
    dotExpr(a, b, dim) / sqrt(normSqExpr(a, dim) * normSqExpr(b, dim))

  /** Sign-random-projection LSH bucket: `planes` hyperplanes whose
    * coefficients are deterministic pseudo-randoms derived from
    * xxhash64(plane, dim-index), mapped to [-0.5, 0.5). The bucket id
    * packs the per-plane sign bits — cosine-close vectors agree on most
    * planes, so probing nearby buckets (hamming <= 1) finds them without
    * the O(n²) scan. */
  def srpBucket(v: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = (0 until dim).map { i =>
        val coeff = (xxhash64(lit(p), lit(i)).bitwiseAND(1023).cast("double") / 1024.0) - 0.5
        v.getItem(i).cast("double") * coeff
      }.reduce(_ + _)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
}
