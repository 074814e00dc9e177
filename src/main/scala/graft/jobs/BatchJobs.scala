package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.PubAggregates
import graft.assoc.Association
import graft.graph.{CommunityDetection, PubGraph}

/** The reference's three batch entry points as parameterized functions
  * (flink-run args → Scala params; defaults are the reference's local
  * script values).
  */
object BatchJobs {

  /** ScipiBatchTopics.main (:30-104): count-threshold filter on the
    * keyword / fos count tables (P13 + S7). */
  def topics(
      keywordCounts: DataFrame,
      fosCounts: DataFrame,
      nOccurrences: Long = 100): (DataFrame, DataFrame) = (
    keywordCounts.where(col("keyword_count") >= nOccurrences),
    fosCounts.where(col("field_study_count") >= nOccurrences))

  case class CommunityResult(
      labelHistogram: DataFrame,          // (label, cnt) dense communities
      decoratedEdges: DataFrame)          // J2: (src, srcType, srcLabel, dst, dstType, dstLabel)

  /** ScipiBatchCommunity.main (:53-357): filter publications by
    * keyword/domain overlap (P12), build the heterogeneous graph (G1),
    * run score-attenuated label propagation (G3), histogram + density
    * filter (A7), keep top-k dense communities (T1), decorate the
    * induced subgraph's edges with both endpoints' type+label (J2).
    *
    * T1's driver round-trip (the reference collect()s the top-k label
    * set into a HashSet) is kept lazy here: a broadcast semi-join
    * against the top-k label rows — same result, no second job. */
  def community(
      pubs: DataFrame,
      keywords: Seq[String] = Nil,
      domains: Seq[String] = Nil,
      iterations: Int = 10,
      delta: Double = 0.5,
      nDense: Long = 30,
      topCommunities: Int = 3): CommunityResult = {
    val spark = pubs.sparkSession
    import spark.implicits._

    // P12: keyword/domain membership filter (skipped when both empty)
    val filtered =
      if (keywords.isEmpty && domains.isEmpty) pubs
      else pubs.where(
        arrays_overlap(col("keywords"), array(keywords.map(lit): _*)) ||
          arrays_overlap(col("fos"), array(domains.map(lit): _*)))

    val vdf = PubGraph.vertices(filtered)
    val edf = PubGraph.edges(filtered)
    val g = PubGraph.toGraphX(vdf, edf)
    val labeled = CommunityDetection.run(
      g.mapVertices((id, _) => id), iterations, delta)

    val hist = labeled.vertices.toDF("id", "label")
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= nDense)

    // T1: top-k by size — distributed TakeOrdered, then broadcast
    val topk = hist.orderBy(col("cnt").desc, col("label").asc).limit(topCommunities)

    val vlab = labeled.vertices.toDF("vid", "label")
      .join(broadcast(topk.select("label")), Seq("label")) // G4 induced vertices
      .join(vdf.select(PubGraph.nameId(col("name")).as("vid"),
        col("name"), col("vtype")), Seq("vid"))

    // J2 ×2: decorate edges with src then dst (name, type, label)
    val e = edf.select(col("src"), col("dst"))
    val decorated = e
      .join(vlab.select(col("name").as("src"), col("vtype").as("srcType"),
        col("label").as("srcLabel")), Seq("src"))
      .join(vlab.select(col("name").as("dst"), col("vtype").as("dstType"),
        col("label").as("dstLabel")), Seq("dst"))
      .select("src", "srcType", "srcLabel", "dst", "dstType", "dstLabel")

    CommunityResult(hist, decorated)
  }

  case class AssociationResult(
      authorKeyword: DataFrame,   // A8: (keyword, author, total_sim)
      collaborators: DataFrame)   // J5: (a, b)

  /** ScipiBatchAssociation.main (:50-328): both branches. */
  def association(
      pubs: DataFrame,
      keywords: Seq[String],
      cosineThreshold: Double = 0.3,
      usageThreshold: Long = 1L): AssociationResult =
    AssociationResult(
      Association.authorKeywordAssociation(pubs, keywords, cosineThreshold),
      Association.potentialCollaborators(pubs, keywords, usageThreshold))

  /** S7: every batch result lands as overwrite CSV with a `first(n)`
    * sample next to it, like the reference's sample/full pairs
    * (ScipiBatchCommunity.java:304-350). */
  def writeCsv(df: DataFrame, path: String, sampleN: Int = 200): Unit = {
    df.write.mode("overwrite").option("header", "true").csv(path)
    df.limit(sampleN).write.mode("overwrite").option("header", "true").csv(s"$path.sample")
  }
}
