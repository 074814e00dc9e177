package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Multi-format source/sink coverage (S7/S9 generalized): the engine
  * reads and writes CSV and JSONL (plus compressed variants) with
  * explicit schemas, round-tripping values exactly. */
class IoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    (1L, "alpha, with comma", 1.5, "2019"),
    (2L, "beta \"quoted\"", -0.25, "2020"),
    (3L, null.asInstanceOf[String], 0.0, "2021")
  ).toDF("id", "name", "score", "year")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("year", StringType)))

  test("csv roundtrip with quoting, nulls, explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val back = spark.read.schema(schema).option("header", "true").csv(s"$dir/c")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("jsonl roundtrip, including gzip compression") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    df.write.mode("overwrite").option("compression", "gzip").json(s"$dir/j")
    assert(new java.io.File(s"$dir/j").listFiles().exists(_.getName.endsWith(".json.gz")))
    val back = spark.read.schema(schema).json(s"$dir/j")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("registerAll exposes the full schema to ad-hoc SQL") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin)
      .as[Long].collect().head
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .as[Long].collect().head > 0)
  }
}
