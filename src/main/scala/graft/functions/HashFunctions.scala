package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch column functions for near-duplicate detection: MinHash
  * signatures + LSH banding, and SimHash. Pure `functions._`
  * compositions over array columns — no UDFs, no driver-side state, so
  * each is a narrow map over the scan and scales linearly with splits.
  *
  * Sketch shapes follow the standard MinHash/LSH construction (Broder;
  * Leskovec-Rajaraman-Ullman ch.3) and SimHash (Charikar), seeded
  * deterministically through xxhash64 so results are reproducible
  * across runs and engines' partitionings.
  */
object HashFunctions {

  /** One 64-bit hash per array element (the shingle-hash base layer —
    * downstream ops join/minimize over these instead of raw strings so
    * shuffles carry 8-byte keys, not text). */
  def elementHashes(arr: Column): Column = transform(arr, x => xxhash64(x))

  /** Same shape but via [[PolyHash64Expr]] + splitmix64 finalization —
    * exactly reproducible in DuckDB HUGEINT arithmetic, which is what
    * upgrades `dedup_simhash` from rows-only to a hard value oracle.
    * The finalizer is NOT optional: raw poly-31 bits are biased (short
    * ASCII tokens leave the high bits structured), and simhash majority
    * votes amplify any corpus-wide bias into identical chunks on every
    * document — measured as a full candidate cross-join before the
    * finalizer went in. */
  def polyElementHashes(arr: Column): Column = {
    // one UDF pass (hash + finalize per element) — an interpreted
    // transform feeding a second UDF would pay per-element expression
    // eval plus an array ser/deser round-trip, the exact overhead this
    // file's other kernels were measured out of
    val f = udf { (ts: Seq[String]) =>
      if (ts == null) null
      else ts.map(t => splitmix64(PolyHash64Expr.compute(t))).toArray
    }
    f(arr)
  }

  /** Distinct word-n-gram shingle hashes of a text, one primitive pass:
    * lowercase, split on whitespace runs, hash each n-gram (poly-31 over
    * the joined gram, splitmix-finalized), dedup. Semantically identical
    * to array_distinct(wordNgrams(tokens(text), n)) + elementHashes —
    * Jaccard only consumes distinct-shingle counts, so any injective-in-
    * practice hash gives the same pair counts — but one UDF pass instead
    * of five interpreted higher-order traversals (~10× on the sketch
    * pipeline). */
  def wordShingleHashes(text: Column, n: Int): Column = {
    val f = udf { (t: String) =>
      if (t == null) Array.empty[Long]
      else {
        val toks = UnicodeText.wsTokens(UnicodeText.simpleLower(t))
        if (toks.length < n) Array.empty[Long]
        else {
          val out = new java.util.HashSet[java.lang.Long](toks.length * 2)
          var i = 0
          while (i <= toks.length - n) {
            var h = 1125899906842597L
            var g = 0
            while (g < n) {
              // code-point fold (not charAt): the oracle's ord() replay
              // and PolyHash64Expr.compute both walk code points — the
              // r13 unicode axis contract
              val w = toks(i + g); var c = 0
              while (c < w.length) {
                val cp = w.codePointAt(c)
                h = h * 31 + cp
                c += Character.charCount(cp)
              }
              h = h * 31 + ' '
              g += 1
            }
            out.add(splitmix64(h)); i += 1
          }
          val arr = new Array[Long](out.size)
          val it = out.iterator(); var j = 0
          while (it.hasNext) { arr(j) = it.next(); j += 1 }
          arr
        }
      }
    }
    f(text)
  }

  /** MinHash signature of length `k` over a pre-hashed shingle array.
    *
    * Implemented as a typed UDF with one primitive-array pass (k·|arr|
    * multiply-add hashes): the columnar alternative — k ×
    * `array_min(transform(...))` — walks the array k times through
    * interpreted lambda eval (higher-order functions don't codegen) and
    * benchmarked ~100× slower. Permutation i is the universal hash
    * (a_i·x + b_i) with odd multipliers seeded from splitmix64(i) —
    * deterministic across runs and partitionings. */
  def minhashSignature(shingleHashes: Column, k: Int): Column = {
    val a = Array.tabulate(k)(i => splitmix64(2L * i + 1) | 1L)
    val b = Array.tabulate(k)(i => splitmix64(2L * i + 2))
    val f = udf { (hs: Array[Long]) =>
      val sig = Array.fill(k)(Long.MaxValue)
      var j = 0
      while (j < hs.length) {
        val h = hs(j); var p = 0
        while (p < k) { val v = a(p) * h + b(p); if (v < sig(p)) sig(p) = v; p += 1 }
        j += 1
      }
      sig
    }
    f(shingleHashes)
  }

  /** Public: also seeds the classifier weight harness
    * (TextQueries.text_classifier_score), which replays it in DuckDB
    * HUGEINT — keep in sync with the simhash oracle's staged chain. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** LSH band hashes: splits a k-length signature into `bands` bands of
    * `rowsPerBand` and hashes each band to one 64-bit bucket key.
    * Returns array<struct<band:int, bucket:long>> ready to explode.
    * Two docs sharing any (band, bucket) are candidate pairs; with
    * k=64, bands=16, r=4 the detect probability at jaccard j is
    * 1-(1-j^4)^16 (≈0.9998 at j=0.8). */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => signature.getItem(b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bucket"))
    }: _*)

  /** 63-bit SimHash over a token array: bit j is set iff more element
    * hashes have bit j set than clear. (63 bits, not 64, to stay in
    * positive Long territory.)
    *
    * One primitive pass (|arr|·63 bit tests) as a typed UDF: the
    * columnar formulation — 63 × `size(filter(...))` — re-walks the
    * array once per bit through interpreted lambda eval (higher-order
    * functions don't codegen), measured 3.8 s vs ~1 s for the whole
    * dedup_simhash query at sf0.1. Same majority rule, same output. */
  def simhash(tokenHashes: Column, bits: Int = 63): Column = {
    val f = udf { (hs0: Array[Long]) =>
      val hs = if (hs0 == null) Array.emptyLongArray else hs0
      val counts = new Array[Int](bits)
      var i = 0
      while (i < hs.length) {
        val h = hs(i); var j = 0
        while (j < bits) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
        i += 1
      }
      var out = 0L; var j = 0
      while (j < bits) { if (counts(j) * 2 > hs.length) out |= (1L << j); j += 1 }
      out
    }
    f(tokenHashes)
  }

  /** Split a simhash into `chunks` bit-chunks for hamming-LSH banding:
    * hamming(a,b) <= chunks-1 implies at least one equal chunk. */
  def simhashChunks(sh: Column, chunks: Int = 4, bits: Int = 64): Column = {
    val w = bits / chunks
    val mask = (1L << w) - 1
    array((0 until chunks).map { c =>
      struct(lit(c).as("chunk"), shiftright(sh, c * w).bitwiseAND(mask).as("value"))
    }: _*)
  }
}
