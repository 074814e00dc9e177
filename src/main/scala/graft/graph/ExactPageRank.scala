package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over scaled 64-bit integers — bit-identical on every run,
  * partitioning, and engine.
  *
  * Float PageRank (GraphX `staticPageRank`, reference
  * ScipiBatchCommunity-style jobs) is only reproducible up to summation
  * order, which is why `graph_part_pagerank` grades an agreement@k
  * certificate against this twin instead of its raw ranks. This
  * variant makes the *whole* iteration integer arithmetic:
  *
  *   - ranks are scaled by 1e9 (`Scale`), initialised to `Scale`
  *   - a vertex sends `rank div deg` to each neighbour (truncating
  *     64-bit division — all values non-negative, so Spark's `div` and
  *     DuckDB's `//` agree)
  *   - new rank = `0.15*Scale + (85 * sum(contribs)) div 100`
  *
  * Integer addition is associative and commutative, so the shuffle's
  * combine order can't change a single bit — the result is a hard value
  * oracle for DuckDB (the same ten iterations unrolled as CTEs).
  *
  * Scale envelope: total rank mass stays ~`V * Scale`; the `85 * sum`
  * intermediate needs `85 * V * 1e9 < 2^63`, good to ~1e8 vertices. A
  * larger graph lowers `Scale` (the iteration is exact at any scale;
  * only the published precision changes).
  *
  * The graph is treated as undirected (each edge sends both ways), which
  * is the natural reading of a co-occurrence graph. Every vertex has
  * degree >= 1 by construction (it appears in an edge), so there are no
  * dangling-mass corrections and the contribution join is inner.
  */
object ExactPageRank {

  val Scale: Long = 1000000000L           // 1e9: rank fixed-point scale
  val Reset: Long = 150000000L            // 0.15 * Scale
  val DampNum = 85L                       // 0.85 damping as a ratio
  val DampDen = 100L

  /** Ranks after `iters` synchronous iterations.
    *
    * @param edges (src: long, dst: long) undirected edge list, one row
    *              per unordered pair (the transform adds the reverse
    *              direction itself). Contract: pairs distinct, no
    *              self-loops — a duplicate pair or loop would double
    *              degrees AND messages (deduping here would cost a
    *              shuffle the caller usually already paid; cooccurEdges'
    *              groupBy guarantees both)
    * @return (v: long, rank_scaled: long)
    */
  /** Shared iteration prep: (degree/vertex table, degree-decorated
    * directed edge table), both persisted.
    *
    * Hash-partition the directed edge list by src BEFORE caching: the
    * per-iteration contribution join then finds both sides already
    * partitioned on the join key (contrib inherits hashpartitioning(v)
    * from the previous groupBy), so each iteration pays exactly ONE
    * exchange — the message stream regrouping by dst. Without this the
    * edge table (the big side) re-exchanges every iteration: measured
    * ~10× slower at sf0.1. The sender's degree is pre-joined INTO the
    * cached edge table so the loop never joins rank with deg. */
  private def prepared(edges: DataFrame): (DataFrame, DataFrame) = {
    // pin the canonical edge list FIRST (r17): und is consumed by both
    // deg and undD, and the old union-with-reversed form additionally
    // referenced `edges` twice — an unpersisted caller pipeline (the
    // driver queries' whole lineitem group-then-expand) executed FOUR
    // times per run (the plan ledger showed 4 lineitem scans). One
    // cached build + the single-pass explode undirect leaves exactly
    // one execution of the caller's pipeline.
    val e0 = graft.CacheRegistry.persistTracked(edges.select(col("src"), col("dst")))
    val und = GraphOps.undirect(e0, Seq("src", "dst")).repartition(col("src"))
    val deg = graft.CacheRegistry.persistTracked(
      und.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg")))
    val undD = graft.CacheRegistry.persistTracked(
      und.join(deg, und("src") === deg("v"))
        .select(col("src"), col("dst"), col("deg")))
    (deg, undD)
  }

  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (deg, undD) = prepared(edges)
    var rank = deg.select(col("v"), lit(Scale).as("rank"))
    for (_ <- 1 to iters) {
      rank = undD.join(rank, undD("src") === rank("v"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst").as("v"))
        .agg((lit(Reset) + expr(s"($DampNum * sum(c)) div $DampDen")).as("rank"))
    }
    rank.select(col("v"), col("rank").as("rank_scaled"))
  }

  /** Personalized PageRank from one `seed` vertex, in the same exact
    * scaled-integer arithmetic: restart mass returns to the SEED only
    * (rank init `Scale` at the seed, 0 elsewhere; per-iteration reset
    * term `Reset` at the seed, 0 elsewhere), so the stationary mass
    * measures proximity to the seed — the graph-local relevance
    * ranking recommendation/curation pipelines key on, as opposed to
    * [[run]]'s global centrality. Identical loop shape and exchange
    * count; identical bit-determinism argument (integer adds commute).
    * Scale envelope is STRICTER than run's in the favorable direction:
    * total mass stays ≤ Scale (it starts there and the damped walk
    * only leaks), so the `85 * sum` intermediate never grows with V. */
  def personalizedRun(edges: DataFrame, seed: Long, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (deg, undD) = prepared(edges)
    var rank = deg.select(col("v"),
      when(col("v") === seed, lit(Scale)).otherwise(lit(0L)).as("rank"))
    for (_ <- 1 to iters) {
      rank = undD.join(rank, undD("src") === rank("v"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst"))
        .agg(expr(s"($DampNum * sum(c)) div $DampDen").as("walk"))
        .select(col("dst").as("v"),
          (when(col("dst") === seed, lit(Reset)).otherwise(lit(0L)) +
            col("walk")).as("rank"))
    }
    rank.select(col("v"), col("rank").as("rank_scaled"))
  }

  /** The identical ten iterations as one DuckDB query: `r0..r{iters}`
    * unrolled CTEs over an `edges(src, dst)` CTE supplied by the caller.
    * Emits the same `(v, rank_scaled)` relation as [[run]].
    */
  def oracleCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT u.dst AS v,
         |         CAST($Reset + ($DampNum * sum(r.rank // g.deg)) // $DampDen AS BIGINT) AS rank
         |  FROM und u
         |  JOIN r${i - 1} r ON r.v = u.src
         |  JOIN deg g ON g.v = u.src
         |  GROUP BY 1)""".stripMargin
    }
    (Seq(
      "und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)",
      "deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1)",
      s"r0 AS (SELECT v, CAST($Scale AS BIGINT) AS rank FROM deg)") ++ steps)
      .mkString(",\n")
  }

  /** [[personalizedRun]]'s iterations as unrolled DuckDB CTEs. The
    * seed is the smallest vertex id, derived IN the oracle (`seed`
    * CTE) so the SQL needs no data-dependent interpolation — the Spark
    * side collects the same min as its literal. */
  def personalizedOracleCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT u.dst AS v,
         |         CAST((CASE WHEN u.dst = (SELECT sv FROM seed) THEN $Reset ELSE 0 END)
         |           + ($DampNum * sum(r.rank // g.deg)) // $DampDen AS BIGINT) AS rank
         |  FROM und u
         |  JOIN r${i - 1} r ON r.v = u.src
         |  JOIN deg g ON g.v = u.src
         |  GROUP BY 1)""".stripMargin
    }
    (Seq(
      "und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)",
      "deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1)",
      "seed AS (SELECT CAST(min(v) AS BIGINT) AS sv FROM deg)",
      s"""r0 AS (SELECT v, CAST(CASE WHEN v = (SELECT sv FROM seed)
         |  THEN $Scale ELSE 0 END AS BIGINT) AS rank FROM deg)""".stripMargin) ++ steps)
      .mkString(",\n")
  }
}
