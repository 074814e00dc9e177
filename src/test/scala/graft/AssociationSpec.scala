package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Tables
import graft.assoc.Association
import org.apache.spark.sql.functions.col

class AssociationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("P15 shingle cosine: hand-computed profile values") {
    val df = Seq(
      ("abc", "abc"),      // identical -> 1.0
      ("ab", "abc"),       // a shorter than k -> 0.0
      ("abcabc", "abc"),   // a: {abc:2,bca:1,cab:1} na=6; b: {abc:1} nb=1; dot=2
      ("xyz", "abc")       // disjoint -> 0.0
    ).toDF("a", "b")
    val sims = df.select(Association.shingleCosine(col("a"), col("b")).as("s"))
      .as[Double].collect()
    assert(sims(0) == 1.0)
    assert(sims(1) == 0.0)
    assert(math.abs(sims(2) - 2.0 / math.sqrt(6.0)) < 1e-12)
    assert(sims(3) == 0.0)
  }

  test("shingle cosine is null-safe") {
    val got = Seq((null.asInstanceOf[String], "abc"), ("abc", null.asInstanceOf[String]))
      .toDF("a", "b")
      .select(Association.shingleCosine(col("a"), col("b")).as("s"))
      .as[Option[Double]].collect()
    assert(got.toSeq == Seq(None, None))
  }

  test("ShingleCosineExpr executes inside whole-stage codegen") {
    // a parquet scan keeps the projection out of constant folding, so
    // the expression must run through its doGenCode path
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .select(Association.shingleCosine(col("p_name"), col("p_type")).as("s"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [shingle_cosine"),
      s"expected the projection inside a codegen stage:\n$plan")
    val vals = df.as[Double].collect()
    assert(vals.nonEmpty && vals.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("A8 association sums similarity per (keyword, author)") {
    val pubs = Seq(
      ("graph mining", Seq("ann", "bob")),
      ("graph theory", Seq("ann"))
    ).toDF("title", "authors")
    val out = Association.authorKeywordAssociation(pubs, Seq("graph"), simThreshold = 0.1)
      .orderBy("author").as[(String, String, Double)].collect()
    // "graph" appears in both titles: ann gets 2 contributions, bob 1
    assert(out.map(_._2).toSeq == Seq("ann", "bob"))
    assert(out(0)._3 > out(1)._3)
  }

  test("A9 + J5: usage threshold then bipartite projection") {
    val pubs = Seq(
      (Seq("ann", "bob"), Seq("ml")),
      (Seq("ann", "cat"), Seq("ml")),
      (Seq("bob"), Seq("ml")),
      (Seq("dan"), Seq("ml")),       // dan: usage 1, below threshold
      (Seq("ann"), Seq("db"))
    ).toDF("authors", "keywords")
    val usage = Association.authorKeywordUsage(pubs, Seq("ml", "db"), usageThreshold = 1L)
    val u = usage.as[(String, String, Long)].collect().toSet
    assert(u == Set(("ann", "ml", 2L), ("bob", "ml", 2L)))
    val pairs = Association.collaboratorProjection(usage).as[(String, String)].collect().toSet
    assert(pairs == Set(("ann", "bob")))
  }
}
