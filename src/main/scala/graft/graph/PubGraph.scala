package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1/G2: the heterogeneous publication graph
  * (ScipiBatchCommunity.java:371-462) as vertex/edge DataFrames plus a
  * GraphX materialization.
  *
  * Vertex identity is the entity *name* (the reference keys vertices by
  * name, so an author and a venue with the same string are one vertex).
  * GraphX needs Long ids: we use xxhash64(name) — deterministic, no
  * extra dictionary job (the reference's zipWithUniqueId dictionary,
  * :185-192, exists only to make Longs; 64-bit hash collisions at even
  * 1e9 vertices are ~1e-2 birthday-odds, acceptable and documented).
  *
  * Divergences from the reference (SURVEY.md §7.4, both deliberate):
  *  - every author gets a WRITTEN edge (the reference's loop at :445-453
  *    drops the last author's);
  *  - author order is `array_sort`ed upstream, so COAUTHOR pairs are
  *    deterministic (reference iterates a HashSet).
  *
  * Scale: a k-author paper emits k(k-1)/2 COAUTHOR edges — quadratic in
  * k. `maxCliqueAuthors` caps the clique (star topology keeps
  * author↔paper edges only) for hyper papers; default Int.MaxValue
  * preserves reference semantics.
  */
object PubGraph {

  val VTypeNone = 0; val VTypeAuthor = 1; val VTypePaper = 2
  val VTypeVenue = 3; val VTypePublisher = 4

  /** Vertex DF: (name, vtype). Distinct by name — first type wins on the
    * (reference-possible) collision of e.g. venue and publisher names. */
  def vertices(pubs: DataFrame): DataFrame = {
    val papers = pubs.select(col("title").as("name"), lit(VTypePaper).as("vtype"))
    val authors = pubs.select(explode(col("authors")).as("name"), lit(VTypeAuthor).as("vtype"))
    val venues = pubs.where(col("venue").isNotNull)
      .select(col("venue").as("name"), lit(VTypeVenue).as("vtype"))
    val pubsr = pubs.where(col("publisher").isNotNull)
      .select(col("publisher").as("name"), lit(VTypePublisher).as("vtype"))
    papers.unionByName(authors).unionByName(venues).unionByName(pubsr)
      .groupBy("name").agg(min("vtype").as("vtype"))
  }

  /** Edge DF: (src, dst, weight=1.0) — PAPER→PUBLISHER, PAPER→VENUE,
    * AUTHOR→PAPER (all authors), AUTHOR↔AUTHOR pairs i<j. */
  def edges(pubs: DataFrame, maxCliqueAuthors: Int = Int.MaxValue): DataFrame = {
    val p2pub = pubs.where(col("publisher").isNotNull)
      .select(col("title").as("src"), col("publisher").as("dst"))
    val p2ven = pubs.where(col("venue").isNotNull)
      .select(col("title").as("src"), col("venue").as("dst"))
    val written = pubs.select(explode(col("authors")).as("src"), col("title").as("dst"))
    val coauth = graft.functions.PairGen.suffixPairs(
      pubs.where(size(col("authors")) <= maxCliqueAuthors),
      col("authors"), "src", "dst")
    p2pub.unionByName(p2ven).unionByName(written).unionByName(coauth)
      .distinct()
      .withColumn("weight", lit(1.0))
  }

  def nameId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = xxhash64(c)

  /** Materialize as GraphX Graph[(vtype, name), weight], partitioned
    * EdgePartition2D (best for the dense co-author cliques). */
  def toGraphX(vertexDf: DataFrame, edgeDf: DataFrame): Graph[(Int, String), Double] = {
    val vrdd = vertexDf.select(nameId(col("name")).as("id"), col("vtype"), col("name"))
      .rdd.map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
    val erdd = edgeDf
      .select(nameId(col("src")).as("s"), nameId(col("dst")).as("d"), col("weight"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    Graph(vrdd, erdd).partitionBy(PartitionStrategy.EdgePartition2D)
  }

  /** A7: community label histogram with density threshold
    * (ScipiBatchCommunity.java:217-234). */
  def labelHistogram(labeled: Graph[Long, Double], minSize: Long)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    labeled.vertices.map { case (_, label) => label }
      .toDF("label")
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minSize)
  }
}
