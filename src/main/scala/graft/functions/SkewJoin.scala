package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual fix for a hot probe key when the build
  * side is too big to broadcast.
  *
  * A hash join shuffles both sides on the key, so one hot key lands its
  * entire probe mass on one reducer (the straggler that decides the
  * stage's wall time at 100 TB). Salting splits that key across
  * `salts` reducers: each probe row gets a deterministic shard from its
  * OWN content, the build side is replicated once per shard, and the
  * join key becomes (key, shard). The output is exactly the plain
  * join's — only the shuffle layout changes. Cost: build side × salts,
  * which is why this targets a big-probe/modest-build pair (AQE's
  * skew-join split solves the same problem post-hoc when partition
  * sizes are observable; salting is the planned form, and the only form
  * available when one KEY — not one partition — is hot).
  */
object SkewJoin {

  /** Inner equi-join of `probe` and `build` with the hot-key mass spread
    * over `salts` shards.
    *
    * @param probeSalt deterministic per-row expression (e.g.
    *   `xxhash64(unique cols)`) — `rand()` would spread too, but breaks
    *   replayability (a retried task would re-salt differently)
    */
  def salted(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      salts: Int, probeSalt: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!probe.columns.contains("__salt") && !build.columns.contains("__salt"),
      "__salt column name collision")
    val p = probe.withColumn("__salt", pmod(probeSalt, lit(salts.toLong)))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    p.join(b, p(probeKey) === b(buildKey) && p("__salt") === b("__salt"))
      .drop("__salt")
  }
}
