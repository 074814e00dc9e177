import graft._
object Probe {
  def main(a: Array[String]): Unit = {
    val sf = sys.env.getOrElse("PROBE_SF", "/root/testdata/sf0.1")
    val names = if (a.nonEmpty) a.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get(32)
    names.foreach { n =>
      val t0 = System.nanoTime
      val c = SparkEntry.queries(n)(spark, sf).count()
      println(f"PROBE $n%-28s $c%9d rows  ${(System.nanoTime - t0) / 1e9}%8.2fs")
    }
    spark.stop()
  }
}
