package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Publication
import graft.ingest.Normalize
import graft.analytics.PubAggregates

/** P1-P5 ingest + A1-A6 aggregates against a hand-built JSON fixture —
  * the acceptance rules mirror ScipiStream.java:476-607 case by case. */
class PublicationPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def oag(json: String*) =
    Publication.fromOagJson(json.toDF("value"))

  private val valid =
    """{"title":"Graph Mining!","doi":"10.1/X","lang":"EN","publisher":"ACM.",
      |"venue":null,"year":"2019","keywords":["graphs","mining"],
      |"authors":[{"name":"Zed Q."},{"name":"Ann B!"}],"fos":["cs"]}""".stripMargin.replace("\n", "")

  test("valid OAG record survives and is normalized, authors sorted") {
    val out = Normalize.publications(oag(valid)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("title") == "graph mining")
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[String]("publisher") == "acm")
    assert(r.getSeq[String](r.fieldIndex("authors")).toList == List("ann b", "zed q"))
    assert(r.getSeq[String](r.fieldIndex("keywords")).toList == List("graphs", "mining"))
  }

  test("acceptance rules reject each invalid shape") {
    val cases = Seq(
      valid.replace("\"EN\"", "\"fr\""),                    // lang != en
      valid.replace("\"10.1/X\"", "null"),                   // doi missing
      valid.replace("\"ACM.\"", "null"),                     // no publisher nor venue
      valid.replace("[\"graphs\",\"mining\"]", "[]")
        .replace("[\"cs\"]", "[]"),                          // no topics
      valid.replace("\"2019\"", "\"219\""),                  // year not 4 chars
      valid.replace("[{\"name\":\"Zed Q.\"},{\"name\":\"Ann B!\"}]", "[]")) // no authors
    cases.zipWithIndex.foreach { case (c, i) =>
      assert(Normalize.publications(oag(c)).count() == 0, s"case $i should be rejected")
    }
  }

  test("DBLP enrichment: constant keywords/fos/lang, key->doi, conference->venue") {
    val j = """{"key":"conf/x/1","title":"A Paper","year":"2018","conference":"ICML","authors":["Bob"]}"""
    val out = Normalize.publications(Publication.fromDblpJson(Seq(j).toDF("value"))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("doi") == "confx1")
    assert(out.head.getAs[String]("venue") == "icml")
    assert(out.head.getSeq[String](out.head.fieldIndex("keywords")).toList == List("computer science"))
    assert(out.head.getAs[String]("dataset") == "dblp")
  }

  private def pubs = Seq(
    ("2019", Seq("a"), Seq("k1"), Seq("f1")),
    ("2019", Seq("a", "b"), Seq("k1", "k2"), Seq("f1")),
    ("2020", Seq("a", "b", "c"), Seq("k2"), Seq("f2")),
    ("2020", Seq("d"), Seq("k1"), Seq("f1"))
  ).toDF("year", "authors", "keywords", "fos")

  test("A1/A2 keyword and fos counts") {
    val kw = PubAggregates.keywordCounts(pubs).as[(String, Long)].collect().toMap
    assert(kw == Map("k1" -> 3L, "k2" -> 2L))
    val fos = PubAggregates.fosCounts(pubs).as[(String, Long)].collect().toMap
    assert(fos == Map("f1" -> 3L, "f2" -> 1L))
  }

  test("A3 year-wise single/joint with percentages") {
    val yw = PubAggregates.yearWiseDistribution(pubs)
      .orderBy("year")
      .select("year", "single", "joint", "total", "single_perc")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(yw(0) == ("2019", 1L, 1L, 2L, 0.5))
    assert(yw(1) == ("2020", 1L, 1L, 2L, 0.5))
  }

  test("A4 authorship pattern: no_authors = unit * articles") {
    val ap = PubAggregates.authorshipPattern(pubs)
      .orderBy("author_unit")
      .as[(Int, Long, Long)].collect()
    assert(ap.toSeq == Seq((1, 2L, 2L), (2, 1L, 2L), (3, 1L, 3L)))
  }

  test("A5 average authors per paper") {
    val aap = PubAggregates.avgAuthorsPerPaper(pubs)
      .orderBy("year")
      .select("year", "no_articles", "no_authors", "avg_author_paper")
      .as[(String, Long, Long, Double)].collect()
    assert(aap(0) == ("2019", 2L, 3L, 1.5))
    assert(aap(1) == ("2020", 2L, 4L, 2.0))
  }

  test("A6 hyper-authorship with threshold") {
    val h = PubAggregates.hyperAuthorship(pubs, threshold = 2)
      .orderBy("hyper_authorship_year")
      .as[(String, Long)].collect()
    assert(h.toSeq == Seq(("2019", 1L), ("2020", 1L)))
  }

  test("A11 cutoff cumulative distribution") {
    val cut = PubAggregates.cutoffCumulative(PubAggregates.authorshipPattern(pubs), cutoff = 2)
      .orderBy("unit")
      .select("unit", "no_articles", "perc", "cum_perc")
      .as[(Int, Long, Double, Double)].collect()
    assert(cut.map(_._1).toSeq == Seq(1, 2, 3))  // 3 = the ">2" bucket
    assert(cut.last._4 == 1.0)
    assert(cut.head._3 == 0.5)
  }

  test("A12/A13/A14: latest-years slice, top-N, community strength") {
    val byYear = Seq(("2018", 5L), ("2019", 7L), ("2020", 9L), ("2021", 1L))
      .toDF("year", "no_articles")
    val latest = PubAggregates.latestYears(byYear, maxYear = "2020", n = 2)
      .as[(String, Long)].collect()
    assert(latest.toSeq == Seq(("2020", 9L), ("2019", 7L)))

    val top = PubAggregates.topTopics(
      Seq(("a", 3L), ("b", 9L), ("c", 5L)).toDF("t", "cnt"), "cnt", 2)
      .as[(String, Long)].collect()
    assert(top.toSeq == Seq(("b", 9L), ("c", 5L)))

    val strength = PubAggregates.communityStrength(
      Seq(30L, 10L).toDF("cnt")).as[Double].collect().head
    assert(strength == (900.0 + 100.0) / 40.0 / 100.0)
  }

  test("qualityScore is bounded and favors clean prose") {
    import graft.functions.TextFunctions.qualityScore
    val rows = Seq(
      "The quick brown fox jumps over the lazy dog and keeps running through the field " * 3,
      "!!!??? ### $$$ %%% ^^^ &&& *** ((( )))")
      .toDF("s").select(qualityScore($"s")).as[Double].collect()
    assert(rows.forall(v => v >= 0.0 && v <= 1.0))
    assert(rows(0) > rows(1), "clean prose should outscore symbol noise")
  }

  test("A15 adjacency table") {
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("a", "b")
    val adj = PubAggregates.adjacencyTable(pairs)
      .orderBy("author").as[(String, String, Long)].collect()
    assert(adj.toSeq == Seq(("a", "b | c", 2L), ("b", "a", 1L), ("c", "a", 1L)))
  }
}
