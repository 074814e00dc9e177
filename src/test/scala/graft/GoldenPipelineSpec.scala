package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Normalize
import graft.jobs.BatchJobs
import graft.model.Publication
import graft.streaming.StreamJobs

/** Golden end-to-end run (SURVEY.md §5.2 item 2): a fixed OAG+DBLP
  * fixture through ingest -> normalize -> every aggregate -> both batch
  * jobs, with exact expected tables inline (mirrors the role of the
  * report's Tables II-VII). Also pins the SQL registration of the
  * custom expression.
  */
class GoldenPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def oag(doi: String, title: String, year: String,
      authors: Seq[String], kws: Seq[String]): String = {
    val as = authors.map(a => s"""{"name":"$a"}""").mkString(",")
    val ks = kws.map(k => s""""$k"""").mkString(",")
    s"""{"title":"$title","doi":"$doi","lang":"en","publisher":"ACM","venue":null,
       |"year":"$year","keywords":[$ks],"authors":[$as],"fos":["computer science"]}"""
      .stripMargin.replace("\n", "")
  }

  private val oagRaw = Seq(
    oag("d1", "graph mining methods", "2019", Seq("ann", "bob"), Seq("graphs", "mining")),
    oag("d2", "graph theory notes", "2019", Seq("ann"), Seq("graphs")),
    oag("d3", "database systems", "2020", Seq("cat", "dan", "eve"), Seq("databases")),
    oag("d4", "rejected: bad year", "20199", Seq("zed"), Seq("x")),     // rejected
    """{"title":"rejected no doi","lang":"en","publisher":"p","year":"2019",
      |"keywords":["k"],"authors":[{"name":"a"}],"fos":[]}""".stripMargin.replace("\n", ""))

  private val dblpRaw = Seq(
    """{"key":"conf/kdd/5","title":"Stream Mining","year":"2020","conference":"KDD",
      |"authors":["ann","cat"]}""".stripMargin.replace("\n", ""))

  private lazy val pubs = Normalize.publications(
    Publication.fromOagJson(oagRaw.toDF("value")))
    .unionByName(Normalize.publications(Publication.fromDblpJson(dblpRaw.toDF("value"))))

  test("golden: acceptance keeps 4 of 6 records") {
    assert(pubs.count() == 4)
  }

  test("golden: all six aggregate tables") {
    val aggs = StreamJobs.aggregates(pubs)
    assert(aggs("keywords").as[(String, Long)].collect().toMap ==
      Map("graphs" -> 2L, "mining" -> 1L, "databases" -> 1L, "computer science" -> 1L))
    assert(aggs("field_study").as[(String, Long)].collect().toMap ==
      Map("computer science" -> 4L))
    assert(aggs("yrwisedist").select("year", "single", "joint", "total")
      .as[(String, Long, Long, Long)].collect().toSet ==
      Set(("2019", 1L, 1L, 2L), ("2020", 0L, 2L, 2L)))
    assert(aggs("authorptrn").select("author_unit", "no_articles", "no_authors")
      .as[(Int, Long, Long)].collect().toSet ==
      Set((1, 1L, 1L), (2, 2L, 4L), (3, 1L, 3L)))
    assert(aggs("aap").select("year", "no_articles", "no_authors")
      .as[(String, Long, Long)].collect().toSet ==
      Set(("2019", 2L, 3L), ("2020", 2L, 5L)))
    assert(aggs("hyper_authorship").where("hyper_authorship_count > 0").count() == 0)
  }

  test("golden: association + community jobs") {
    val assoc = BatchJobs.association(pubs, Seq("graphs", "databases"),
      cosineThreshold = 0.2, usageThreshold = 0L)
    val collab = assoc.collaborators.as[(String, String)].collect().toSet
    // graphs: {ann, bob}; databases: {cat, dan, eve}
    assert(collab == Set(("ann", "bob"), ("cat", "dan"), ("cat", "eve"), ("dan", "eve")))

    val comm = BatchJobs.community(pubs, keywords = Seq("graphs"),
      nDense = 2, topCommunities = 2)
    assert(comm.labelHistogram.count() >= 1)
    assert(comm.decoratedEdges.count() >= 1)
  }

  test("shingle_cosine is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT shingle_cosine('abcabc', 'abc') AS s")
      .as[Double].collect().head
    assert(math.abs(got - 2.0 / math.sqrt(6.0)) < 1e-12)
    val got4 = spark.sql("SELECT shingle_cosine('abcd', 'abcd', 4) AS s")
      .as[Double].collect().head
    assert(got4 == 1.0)
  }

  test("poly_hash64 is callable from SQL and matches the expression path") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT poly_hash64('hello world') AS h")
      .as[Long].collect().head
    assert(viaSql == graft.functions.PolyHash64Expr.compute("hello world"))
  }
}
