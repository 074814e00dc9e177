import graft._
object ExplainProbe {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    a.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
