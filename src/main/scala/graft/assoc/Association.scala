package graft.assoc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.charNgrams

/** The reference's association/recommendation branch
  * (ScipiBatchAssociation.java): k-shingle cosine keyword↔title
  * association (P15 + A8) and bipartite-projection collaborator
  * recommendation (P14 + A9 + J5).
  *
  * Scale notes: the cosine flatMap is a narrow map against a broadcast
  * keyword list (no shuffle); both groupBys carry (string, string, num)
  * triples; the J5 projection is a self-equi-join on keyword — the known
  * skew point ("computer science" is on every DBLP record) handled by
  * AQE skew-split, with the same O(Σ deg²) shape that took the
  * reference from 20 min to <1 min vs its naive graph join.
  */
object Association {

  /** P15: cosine similarity between the k-shingle *count profiles* of
    * two strings (the reference uses info.debatty Cosine(k=3),
    * ScipiBatchAssociation.java:109-142):
    * dot = Σ_g count_a(g)·count_b(g); norm² = Σ_g count(g)²; empty
    * profile → 0.0. Backed by the codegen'd Catalyst expression
    * [[graft.functions.ShingleCosineExpr]]. */
  def shingleCosine(a: Column, b: Column, k: Int = 3): Column =
    graft.functions.ShingleCosineExpr(a, b, k)

  /** P15 + A8: per (keyword, author), Σ of cosine(keyword, title) over
    * publications where the similarity clears `simThreshold`
    * (ScipiBatchAssociation.java:109-155). `keywords` is a tiny
    * user-supplied list — it rides along as a literal array (Catalyst
    * folds it; the broadcast-HashSet of the reference). */
  def authorKeywordAssociation(
      pubs: DataFrame,
      keywords: Seq[String],
      simThreshold: Double = 0.3,
      k: Int = 3): DataFrame =
    pubs.select(col("title"), explode(col("authors")).as("author"))
      .withColumn("keyword", explode(array(keywords.map(lit): _*)))
      .select(col("keyword"), col("author"),
        shingleCosine(col("keyword"), col("title"), k).as("sim"))
      .where(col("sim") > simThreshold)
      .groupBy("keyword", "author")
      .agg(sum("sim").as("total_sim"))

  /** P14 + A9: (author, keyword) usage counts over the intersection of
    * each publication's keywords with the user-defined list, thresholded
    * (ScipiBatchAssociation.java:192-244). */
  def authorKeywordUsage(
      pubs: DataFrame,
      definedKeywords: Seq[String],
      usageThreshold: Long = 1L): DataFrame =
    pubs.select(
        explode(col("authors")).as("author"),
        array_intersect(col("keywords"),
          array(definedKeywords.map(lit): _*)).as("kws"))
      .select(col("author"), explode(col("kws")).as("keyword"))
      .groupBy("author", "keyword")
      .agg(count(lit(1)).as("usage"))
      .where(col("usage") > usageThreshold)

  /** J5: bipartite top-projection — author pairs sharing a keyword
    * (ScipiBatchAssociation.java:277-294 projectionTopSimple). A
    * self-equi-join on the bottom-vertex key; `a < b` halves the output
    * and makes it deterministic. */
  def collaboratorProjection(usage: DataFrame): DataFrame =
    usage.select(col("keyword"), col("author").as("a")).as("l")
      .join(usage.select(col("keyword"), col("author").as("b")).as("r"), Seq("keyword"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()

  /** End-to-end recommendation branch (ScipiBatchAssociation.java:50-328
    * branch 2): usage counts → threshold → projection. */
  def potentialCollaborators(
      pubs: DataFrame,
      definedKeywords: Seq[String],
      usageThreshold: Long = 1L): DataFrame =
    collaboratorProjection(authorKeywordUsage(pubs, definedKeywords, usageThreshold))
}
