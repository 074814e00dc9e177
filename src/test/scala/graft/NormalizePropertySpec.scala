package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions.col
import graft.functions.TextFunctions._

/** SURVEY §5.2 item 1: property-based coverage of the normalization
  * layer — idempotence, charset closure, rejection completeness. Inputs
  * are generated once per property and evaluated through the real
  * column pipeline (batched into one DataFrame per property for
  * speed). */
class NormalizePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val weird = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '.', ',', '!', '?', '-', '_', '/', '\\', '"', '\''),
    1 -> Gen.choose(' ', 'ɏ'))).map(_.mkString)

  private def normalizeAll(inputs: Seq[String]): Seq[Option[String]] =
    inputs.toDF("s").select(normalizeStr(col("s")).as("n"))
      .as[Option[String]].collect().toSeq

  test("normalizeStr is idempotent and closed over [a-z0-9 space]") {
    // pinned seed: reproducible coverage, total (no .sample None flake)
    val inputs = Gen.listOfN(200, weird)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(0x12340001L))
    val once = normalizeAll(inputs)
    val twice = normalizeAll(once.map(_.orNull))
    assert(once == twice, "idempotence")
    once.flatten.foreach { n =>
      assert(n.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c.isWhitespace),
        s"charset closure violated: '$n'")
      assert(n == n.trim && n.nonEmpty)
    }
  }

  test("normalizeTopics output is deduped, <= 30 chars, null-free") {
    val topicArrays = Gen.listOfN(60, Gen.listOf(weird))
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(0x12340002L))
    val out = topicArrays.toDF("a")
      .select(normalizeTopics(col("a")).as("n"))
      .as[Seq[String]].collect()
    out.foreach { arr =>
      assert(arr.distinct == arr, "deduped")
      assert(arr.forall(t => t != null && t.length <= 30))
    }
  }

  test("rejection completeness: every rule violation is dropped") {
    // generate records violating exactly one acceptance rule each
    val base = """{"title":"T","doi":"d","lang":"en","publisher":"p","venue":null,
      |"year":"2019","keywords":["k"],"authors":[{"name":"a"}],"fos":[]}"""
      .stripMargin.replace("\n", "")
    val violations = Seq(
      base.replace(""""lang":"en"""", """"lang":"de""""),
      base.replace(""""doi":"d"""", """"doi":"..."""),   // doi normalizes to null
      base.replace(""""title":"T"""", """"title":"!!!""""),
      base.replace(""""publisher":"p"""", """"publisher":null"""),
      base.replace(""""keywords":["k"]""", """"keywords":["???"]"""),
      base.replace(""""year":"2019"""", """"year":"19"""),
      base.replace("""[{"name":"a"}]""", """[{"name":"??"}]"""))
    val df = graft.ingest.Normalize.publications(
      graft.model.Publication.fromOagJson(violations.toDF("value")))
    assert(df.count() == 0)
    // and the base record itself passes
    assert(graft.ingest.Normalize.publications(
      graft.model.Publication.fromOagJson(Seq(base).toDF("value"))).count() == 1)
  }
}
