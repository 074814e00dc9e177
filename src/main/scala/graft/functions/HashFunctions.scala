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

  /** MinHash signature of length `k` over a pre-hashed shingle array:
    * permutation i is xxhash64(i, h) — min over the array per i. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleHashes, h => xxhash64(lit(i), h)))
    }: _*)

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
    * positive Long territory.) */
  def simhash(tokenHashes: Column, bits: Int = 63): Column = {
    val n = size(tokenHashes)
    (0 until bits).map { j =>
      val ones = size(filter(tokenHashes, h => shiftright(h, j).bitwiseAND(1) === 1))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
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
