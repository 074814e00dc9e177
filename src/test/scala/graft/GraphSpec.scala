package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.graphx.{Edge, Graph}
import graft.graph.{CommunityDetection, PubGraph}

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("G1 builder: vertices and edges of a 2-publication fixture") {
    val pubs = Seq(
      ("paper one", Seq("ann", "bob"), Some("icml"), None: Option[String]),
      ("paper two", Seq("ann"), None: Option[String], Some("acm"))
    ).toDF("title", "authors", "venue", "publisher")

    val v = PubGraph.vertices(pubs).as[(String, Int)].collect().toMap
    assert(v == Map(
      "paper one" -> PubGraph.VTypePaper, "paper two" -> PubGraph.VTypePaper,
      "ann" -> PubGraph.VTypeAuthor, "bob" -> PubGraph.VTypeAuthor,
      "icml" -> PubGraph.VTypeVenue, "acm" -> PubGraph.VTypePublisher))

    val e = PubGraph.edges(pubs).select("src", "dst").as[(String, String)].collect().toSet
    assert(e == Set(
      ("paper one", "icml"),          // PAPER -> VENUE
      ("paper two", "acm"),           // PAPER -> PUBLISHER
      ("ann", "paper one"), ("bob", "paper one"),  // WRITTEN: every author
      ("ann", "paper two"),
      ("ann", "bob")))                // COAUTHOR i<j once
  }

  test("G1 clique cap: star topology for hyper papers") {
    val pubs = Seq(("big", (1 to 5).map(i => s"a$i"), Some("v"), None: Option[String]))
      .toDF("title", "authors", "venue", "publisher")
    val e = PubGraph.edges(pubs, maxCliqueAuthors = 3)
      .select("src", "dst").as[(String, String)].collect()
    assert(!e.exists { case (s, d) => s.startsWith("a") && d.startsWith("a") })
    assert(e.count { case (_, d) => d == "big" } == 5) // WRITTEN edges kept
  }

  test("G3 Pregel: two disconnected triangles converge to two communities") {
    val sc = spark.sparkContext
    val edges = sc.parallelize(Seq(
      Edge(1L, 2L, 1.0), Edge(2L, 3L, 1.0), Edge(1L, 3L, 1.0),
      Edge(4L, 5L, 1.0), Edge(5L, 6L, 1.0), Edge(4L, 6L, 1.0)))
    val g = Graph.fromEdges(edges, 0L)
    val labeled = CommunityDetection.run(g, iterations = 10, delta = 0.5)
    val labels = labeled.vertices.collect().toMap
    assert(Set(1L, 2L, 3L).map(labels) .size == 1, "triangle 1 should share a label")
    assert(Set(4L, 5L, 6L).map(labels).size == 1, "triangle 2 should share a label")
    assert(labels(1L) != labels(4L), "triangles should differ")
  }

  test("G4 subgraph by labels") {
    val sc = spark.sparkContext
    val g = Graph.fromEdges(sc.parallelize(Seq(Edge(1L, 2L, 1.0), Edge(3L, 4L, 1.0))), 0L)
      .mapVertices((id, _) => if (id <= 2) 10L else 20L)
    val sub = CommunityDetection.subgraphByLabels(g, Set(10L))
    assert(sub.vertices.count() == 2 && sub.edges.count() == 1)
  }
}
