package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-attenuated label propagation (Leung et al. 2009 — the same
  * algorithm as [[CommunityDetection]], reference
  * ScipiBatchCommunity.java:210) over scaled 64-bit integers —
  * bit-identical on every run, partitioning, and engine, so unlike the
  * float/Pregel tier it takes a hard DuckDB value oracle (the same ten
  * supersteps unrolled as CTEs). Same trick as [[ExactPageRank]].
  *
  * Why this works: Leung's update has NO division —
  * `newScore = max_label(Σ neighborScore·w) − delta/2` — so with scores
  * scaled by `Scale` (and delta/2 = 0.25 → `DeltaHalf = Scale/4`) every
  * operation is exact integer arithmetic. Integer addition commutes, so
  * the shuffle's combine order can't change a bit; and while values stay
  * under the saturation cap the integer run is EXACTLY the float run
  * ×`Scale` (floats are exact on integers < 2^53).
  *
  * Scores grow multiplicatively (each superstep multiplies by roughly
  * the weighted degree), so unbounded 10-superstep runs would overflow
  * int64 on dense graphs. The integer tier therefore saturates:
  * `score = min(newScore, Cap)`. `Cap = 2^44` keeps the next superstep's
  * per-label sum under `deg·w·Cap < 2^63` for weighted degrees up to
  * ~5·10^5, and the cap is part of the algorithm definition — mirrored
  * verbatim in the SQL oracle, so saturated runs still grade exactly.
  *
  * Semantics per superstep (Gelly-compatible, undirected):
  *  - every vertex sends (label, score·w) to each neighbor;
  *  - a vertex sums received scores per label, adopts the argmax label
  *    (ties to the smaller label), and attenuates:
  *    newScore = min(maxSum − DeltaHalf, Cap);
  *  - exactly `iters` supersteps (no convergence test), seed label = v,
  *    seed score = Scale.
  *
  * Plan shape: the undirected weighted edge list is hash-partitioned by
  * src once and cached; each superstep is one co-partitioned join
  * (edges ⋈ state on src = v) plus ONE exchange (messages regrouped by
  * dst) — the two aggregations (per-(v,label) sum, then per-v argmax)
  * both ride the same hashpartitioning(v), so Catalyst inserts no
  * further shuffle. Identical discipline to ExactPageRank's loop.
  */
object ExactCommunities {

  val Scale: Long = 10000L          // 1e4 fixed-point (delta/2 exact)
  val DeltaHalf: Long = Scale / 4L  // Gelly delta = 0.5 → delta/2 = 0.25
  val Cap: Long = 1L << 44          // score saturation (overflow guard)

  /** Community label per vertex after `iters` supersteps.
    *
    * @param edges (src, dst, w) undirected weighted edge list, one row
    *              per unordered pair, distinct, no self-loops (the
    *              cooccurEdges groupBy guarantees both).
    * @return (v: long, label: long)
    */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // single-pass explode undirect (r17): the union-with-reversed form
    // referenced `edges` twice, executing an unpersisted caller
    // pipeline twice before this persist could help
    val und = graft.CacheRegistry.persistTracked(
      GraphOps.undirect(edges.select(col("src"), col("dst"), col("w")),
        Seq("src", "dst", "w")).repartition(col("src")))
    var state = und.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"), lit(Scale).as("score"))
    for (_ <- 1 to iters) {
      state = und.join(state, und("src") === state("v"))
        .select(col("dst").as("v2"), col("label"),
          (col("score") * col("w")).as("m"))
        .repartition(col("v2")) // the superstep's ONE message exchange
        .groupBy(col("v2"), col("label")).agg(sum(col("m")).as("ls"))
        // argmax label by summed score, ties to the SMALLER label:
        // struct max takes the highest ls, then the highest -label
        .groupBy(col("v2"))
        .agg(max(struct(col("ls"), (-col("label")).as("nl"))).as("best"))
        .select(col("v2").as("v"), (-col("best.nl")).as("label"),
          least(col("best.ls") - lit(DeltaHalf), lit(Cap)).as("score"))
    }
    state.select(col("v"), col("label"))
  }

  /** The identical supersteps as DuckDB CTEs `s0..s{iters}` over an
    * `edges(src, dst, w)` CTE supplied by the caller. Emits the same
    * `(v, label)` relation as [[run]].
    */
  def oracleCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""m$i AS (
         |  SELECT u.dst AS v, s.label, sum(s.score * u.w) AS ls
         |  FROM und u JOIN s${i - 1} s ON s.v = u.src GROUP BY 1, 2),
         |s$i AS (
         |  SELECT v, label, LEAST(ls - $DeltaHalf, $Cap) AS score FROM (
         |    SELECT v, label, ls, row_number() OVER (
         |      PARTITION BY v ORDER BY ls DESC, label ASC) AS rn FROM m$i)
         |  WHERE rn = 1)""".stripMargin
    }
    (Seq(
      "und AS (SELECT src, dst, w FROM edges UNION ALL SELECT dst, src, w FROM edges)",
      "verts AS (SELECT DISTINCT src AS v FROM und)",
      s"s0 AS (SELECT v, v AS label, CAST($Scale AS BIGINT) AS score FROM verts)") ++ steps)
      .mkString(",\n")
  }
}
