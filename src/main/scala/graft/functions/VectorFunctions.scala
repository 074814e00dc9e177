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

  /** Exact rounded cosine with the NON-FINITE contract (r14 embeddings
    * NaN/zero-vector axis): a zero-norm side divides by zero (ANSI
    * THROWS), a NaN component poisons the dot — both pin to NULL, and
    * every ranking window orders sim DESC NULLS LAST, so garbage
    * vectors never win a top-k slot. Query-plane callers keep the
    * fill-ranks contract (NULL sims still take ranks when nothing
    * finite remains — their oracles mirror it); serving paths filter
    * sims to non-null ([[graft.io.VectorIndex.probe]]). ONE definition
    * for both planes (r17 — probe carried an inline copy, the exact
    * query-vs-serving drift class the r16 ranking-plane sweep hunted).
    *
    * DuckDB mirrors guard NaN via `isnan(...) THEN NULL` (its 0/0 is
    * already NULL, but its bare NaN sorts GREATEST — above every real
    * sim — so an unguarded NaN flips top-k on the first corrupt
    * vector). */
  def guardedSim(dot: Column, nsqA: Column, nsqB: Column): Column =
    // guard the NORMS, not the quotient: a NaN component makes its
    // side's nsq NaN and a zero vector makes it 0, while two finite
    // nonzero-norm vectors can never produce a non-finite quotient
    // (float components bound the double dot far below overflow) — so
    // the per-PAIR cost is one scalar branch, not a second 64-term
    // expression (the first guarded form re-ran the quotient inside
    // its isnan check and showed up as 1.6–1.8× on the broadcast×N
    // scans' bench rows)
    // nsq = +Inf (an ±Inf COMPONENT — r15 arm: the one non-finite input
    // the NaN/zero guards don't reach) must also pin to NULL: the
    // quotient under an Inf norm is NaN (dot is ±Inf or NaN — an Inf
    // component times a zero partner is NaN, times anything else ±Inf)
    // and raw NaN sorts FIRST under Spark's desc while the oracle's
    // isnan(...)→NULL ranks it LAST. nsq is a sum of squares, so +Inf
    // is the only non-finite sign to guard beyond NaN.
    when(isnan(nsqA) || nsqA === 0 || nsqA === Double.PositiveInfinity ||
      isnan(nsqB) || nsqB === 0 || nsqB === Double.PositiveInfinity,
      lit(null).cast("double"))
      .otherwise(round(dot / sqrt(nsqA * nsqB), 6))

  /** Cosine similarity as a primitive loop — bit-identical to
    * [[cosineExpr]] (same index order, accumulators start at +0.0 and
    * x + 0.0 == x, the signBucket argument), for call sites where the
    * unrolled form's 192 terms land TWICE in one fused stage (a
    * pushed-down filter duplicates the aliased projection) and push
    * the generated processNext() past janino's 64 KB method limit —
    * the whole stage then loses codegen, which costs more than the
    * UDF boundary ever could. */
  def cosineLoop(a: Column, b: Column, dim: Int): Column = {
    val f = udf { (x: Array[Float], y: Array[Float]) => cosineScalar(x, y, dim) }
    f(a, b)
  }

  /** The [[cosineLoop]] kernel as a plain function — shared by the
    * streaming semantic-decontamination tag, whose eval index lives in
    * a driver broadcast rather than a column. */
  def cosineScalar(x: Array[Float], y: Array[Float], dim: Int): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < dim) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / math.sqrt(nx * ny)
  }

  /** [[cosineLoop]] against a DOUBLE-coordinate vector (a trained
    * k-means centroid — per-dimension means leave the float lattice).
    * Same accumulation order as [[cosineScalar]], so the DuckDB replay
    * (float side cast term-by-term, centroid side used as-is) matches
    * bit-for-bit. */
  def cosineLoopD(v: Column, c: Column): Column = {
    val f = udf { (x: Seq[Float], y: Seq[Double]) =>
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < y.length) {
        val xi = x(i).toDouble; val yi = y(i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      dot / math.sqrt(nx * ny)
    }
    f(v, c)
  }

  /** Squared L2 distance to a DOUBLE-coordinate centroid — the Lloyd
    * assignment kernel. Primitive loop, subtraction-then-square summed
    * left-to-right in index order; the oracle replays the identical
    * chain, so argmin ranks (and their ties, broken on cluster id)
    * agree across engines bit-for-bit. Never NaN: finite inputs only
    * subtract and multiply, so a zero vector assigns by real distances
    * — no NaN ordering hazard on the k-means path. */
  def sqDistLoopD(v: Column, c: Column): Column = {
    val f = udf { (x: Seq[Float], y: Seq[Double]) =>
      var d = 0.0
      var i = 0
      while (i < y.length) {
        val diff = x(i).toDouble - y(i)
        d += diff * diff
        i += 1
      }
      d
    }
    f(v, c)
  }

  /** Sign-random-projection LSH bucket: `planes` hyperplanes with
    * deterministic splitmix64-seeded coefficients in [-0.5, 0.5). The
    * bucket id packs the per-plane sign bits — cosine-close vectors
    * agree on most planes, so probing nearby buckets (hamming <= 1)
    * finds them without the O(n²) scan.
    *
    * A UDF rather than an unrolled column expression: planes×dim terms
    * (512 here) make janino spend >10 s compiling the generated method —
    * more than the whole query's runtime — while the primitive loop is
    * compile-free and equally distributed. */
  def srpBucket(v: Column, dim: Int, planes: Int, table: Int = 0): Column = {
    val coeffs = Array.tabulate(planes, dim) { (p, i) =>
      ((splitmix64((table.toLong * planes + p) * dim + i) & 1023L).toDouble / 1024.0) - 0.5
    }
    val f = udf { (vec: Array[Float]) =>
      var bucket = 0
      var p = 0
      while (p < planes) {
        var proj = 0.0
        val row = coeffs(p)
        var i = 0
        while (i < dim) { proj += vec(i).toDouble * row(i); i += 1 }
        if (proj >= 0) bucket |= (1 << p)
        p += 1
      }
      bucket
    }
    f(v)
  }

  /** Integer SRP coefficients for the ORACLE-REPLICATED sign-bucket
    * family: plane p, dim i → (splitmix64 mod 1024) − 512 ∈ [−512, 511].
    * Unlike [[srpBucket]]'s fractional coefficients (certificate-graded
    * only), these are integers so the DuckDB oracle interpolates them
    * EXACTLY, and ±512 × a float mantissa fits in 34 significant bits —
    * every per-term product is exact in double, leaving the fixed
    * left-to-right summation as the only rounding, which both engines
    * share (the [[dotExpr]] discipline). */
  def srpIntCoeffs(planes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(planes, dim)((p, i) =>
      (splitmix64(1000000007L + p.toLong * dim + i) & 1023L) - 512L)

  /** Sign bucket over the first `bits` planes of `coeffs` (bits is a
    * COLUMN — the adaptive-B selection rides the plan, no driver
    * action): bit p set iff Σᵢ coeffs(p)(i)·v(i) > 0, products exact,
    * sum left-to-right from +0.0 (x + 0.0 = x exactly, so the fold
    * equals the oracle's bare term chain). A UDF, not an unrolled
    * expression, for the same janino reason as [[srpBucket]]:
    * 16×64 = 1024 codegen terms cost more to compile than to run,
    * while the primitive loop is compile-free and equally distributed
    * (map-side only — buckets shuffle as one long). */
  def signBucket(v: Column, bits: Column, coeffs: Array[Array[Long]], dim: Int): Column = {
    val f = udf { (vec: Array[Float], bits: Long) =>
      signBucketScalar(vec, bits.toInt, coeffs, dim)
    }
    f(v, bits)
  }

  /** The [[signBucket]] kernel as a plain function — shared by the
    * streaming semantic-decontamination tag's driver-side eval index
    * build, so stream and batch quantize identically by construction. */
  def signBucketScalar(vec: Array[Float], bits: Int, coeffs: Array[Array[Long]], dim: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < bits) {
      var proj = 0.0
      val row = coeffs(p)
      var i = 0
      while (i < dim) { proj += vec(i).toDouble * row(i); i += 1 }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** max |a[i]|, unrolled (floored at 1e-30 so a zero vector quantizes
    * to all-zeros instead of NaN). */
  def maxAbsExpr(a: Column, dim: Int): Column =
    greatest(lit(1e-30) +: (0 until dim).map(i => abs(a.getItem(i).cast("double"))): _*)

  /** Symmetric int8 quantization: q[i] = floor(a[i] * 127 / maxAbs + 0.5)
    * ∈ [-127, 127], dequant step = maxAbs / 127. floor(x + 0.5) rather
    * than round() so the rule is engine-agnostic (round() half-even vs
    * half-up varies); here only Spark evaluates it, but the convention
    * costs nothing. Unrolled → whole-stage codegen. */
  def int8QuantExpr(a: Column, dim: Int, maxAbs: Column): Column =
    array((0 until dim).map(i =>
      floor(a.getItem(i).cast("double") * 127.0 / maxAbs + 0.5).cast("int")): _*)

  /** Integer dot of two int8 arrays, unrolled (max |value| is
    * 127²·dim ≈ 10⁶ at dim 64 — comfortably int). On a columnar native
    * engine this is the VNNI/SDOT kernel; here the point is the 4×
    * smaller candidate-scan payload and no sqrt/norms until re-rank. */
  def intDotExpr(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i => a.getItem(i) * b.getItem(i)).reduce(_ + _)

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
