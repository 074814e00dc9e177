import graft._
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    def time(n: String)(f: => Long) = { val t0=System.nanoTime; val c=f; println(s"$n: $c rows in ${(System.nanoTime-t0)/1e9}s") }
    time("warmup")(Tables.documents(spark, "/root/testdata/sf0.001").count())
    time("normalize_filter")(SparkEntry.queries("text_normalize_filter")(spark, "/root/testdata/sf0.001").count())
    time("normalize_filter2")(SparkEntry.queries("text_normalize_filter")(spark, "/root/testdata/sf0.001").count())
    SparkEntry.queries("text_normalize_filter")(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
