package graft.queries

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.CommunityDetection

/** Graph-algorithm surface (G3/A7/A14) on the driver testdata: the
  * part-co-occurrence graph (parts are vertices, an edge when two parts
  * appear in >= 2 common orders) stands in for the publication graph.
  *
  * Community labels depend on the algorithm's label dynamics, so these
  * are rows-only-checked by the driver; algorithm correctness is pinned
  * by GraphSpec's hand-checkable fixtures. Label *ids* are vertex ids
  * (part keys) — deterministic across runs.
  */
object GraphQueries extends QueryPack {

  private def cooccurEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    op.as("a").join(op.as("b"),
        col("a.okey") === col("b.okey") && col("a.pkey") < col("b.pkey"))
      .groupBy(col("a.pkey").as("src"), col("b.pkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
  }

  /** An iterative graph job schedules ~3 stages per superstep; with a
    * small edge set, 32 near-empty tasks per stage cost more wall time
    * than the compute. Size partitions to the data (one per ~50k edges,
    * min 4) — on a real cluster the same rule yields hundreds. */
  private def sizedPartitions(s: org.apache.spark.sql.SparkSession, nEdges: Long): Int =
    math.max(4, math.min(s.sparkContext.defaultParallelism, (nEdges / 50000L).toInt))

  override def queries: Map[String, Q] = Map(
    // G3 + A7: score-attenuated label propagation, label histogram.
    "graph_part_communities" -> ((s, d) => {
      import s.implicits._
      val edf = cooccurEdges(s, d).persist()
      val erdd = edf
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
        .coalesce(sizedPartitions(s, edf.count()))
      val g = Graph.fromEdges(erdd, 0L)
      val labeled = CommunityDetection.run(g, iterations = 10, delta = 0.5)
      labeled.vertices.map { case (_, label) => label }.toDF("label")
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt").as("community_size"))
        .agg(count(lit(1)).as("n_communities"))
    }),

    // PageRank over the co-occurrence graph: top-20 "hub" parts.
    // Float summation order varies per run -> rounded, rows-only check.
    "graph_part_pagerank" -> ((s, d) => {
      import s.implicits._
      val edf = cooccurEdges(s, d).persist()
      val erdd = edf.rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
        .coalesce(sizedPartitions(s, edf.count()))
      Graph.fromEdges(erdd, 0L).staticPageRank(10)
        .vertices.toDF("pkey", "rank")
        .select(col("pkey"), round(col("rank"), 4).as("rank"))
        .orderBy(col("rank").desc, col("pkey").asc)
        .limit(20)
    }),

    // Triangle counts: how clique-ish each part's neighborhood is.
    "graph_part_triangles" -> ((s, d) => {
      import s.implicits._
      val edf = cooccurEdges(s, d).persist()
      val erdd = edf.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
        .coalesce(sizedPartitions(s, edf.count()))
      Graph.fromEdges(erdd, 0L)
        .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
        .triangleCount()
        .vertices.toDF("pkey", "triangles")
        .where(col("triangles") > 0)
        .groupBy("triangles").agg(count(lit(1)).as("n_parts"))
    }),

    // Connected components (GraphX built-in) — component size histogram.
    "graph_part_components" -> ((s, d) => {
      import s.implicits._
      val edf = cooccurEdges(s, d).persist()
      val erdd = edf
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
        .coalesce(sizedPartitions(s, edf.count()))
      val g = Graph.fromEdges(erdd, 0L)
      g.connectedComponents().vertices.map(_._2).toDF("component")
        .groupBy("component").agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt").as("component_size"))
        .agg(count(lit(1)).as("n_components"))
    }))

  // Community/component membership isn't SQL-expressible → rows-only.
  override def oracles: Map[String, String] = Map.empty
}
