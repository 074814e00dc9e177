package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ClassifierWeights

/** Re-runs the integer-perceptron training loop over the committed
  * labeled corpus (src/test/resources/classifier_corpus.tsv) and
  * asserts it reproduces ClassifierWeights.Weights EXACTLY — the
  * shipped model is a real learned asset, regenerable from the corpus
  * with the committed algorithm. All arithmetic is integer, so the
  * assertion is bit-exact with no float-order caveats.
  */
class ClassifierSpec extends AnyFunSuite {

  private def loadExamples(): Seq[(Int, Seq[String])] = {
    val in = getClass.getResourceAsStream("/classifier_corpus.tsv")
    assert(in != null, "classifier_corpus.tsv missing from test resources")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.trim.nonEmpty)
      .map { l =>
        val Array(lab, text) = l.split("\t", 2)
        (lab.toInt,
          text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSeq)
      }.toSeq
  }

  private def train(examples: Seq[(Int, Seq[String])], epochs: Int): Map[String, Long] = {
    val w = scala.collection.mutable.Map[String, Long]()
    for (_ <- 1 to epochs; (y, toks) <- examples) {
      val margin = toks.map(t => w.getOrElse(t, 0L)).sum
      if (margin * y <= 0) toks.foreach(t => w(t) = w.getOrElse(t, 0L) + y)
    }
    w.toMap
  }

  test("the committed weight table is exactly what training on the committed corpus produces") {
    val examples = loadExamples()
    assert(examples.size == 30)
    val trained = train(examples, epochs = 20)
    val nonzero = trained.toSeq.filter(_._2 != 0L).sorted
    assert(nonzero == ClassifierWeights.Weights.sorted,
      "retrained weights diverge from the committed table")
  }

  test("the committed model separates its training corpus (margin sign == label on every row)") {
    val w = ClassifierWeights.Weights.toMap
    loadExamples().foreach { case (y, toks) =>
      val margin = toks.map(t => w.getOrElse(t, 0L)).sum
      assert(margin * y > 0, s"misclassified training row (y=$y): ${toks.take(5).mkString(" ")}…")
    }
  }

  test("uncertainty sample is exactly the per-source smallest-|margin| top-k of the full scoring pass") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("text_uncertainty_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    SparkEntry.releaseCaches()
    // full ground truth: every doc's score from the graded scoring
    // query, decorated with its source
    val full = SparkEntry.queries("text_classifier_score")(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "source"), Seq("doc_id"))
      .select("source", "doc_id", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    SparkEntry.releaseCaches()
    val bySource = full.groupBy(_._1)
    got.groupBy(_._1).foreach { case (src, rows) =>
      val pool = bySource(src).map { case (_, id, s) => (math.abs(s), id, s) }.sorted
      val want = pool.take(10).zipWithIndex
        .map { case ((a, id, s), i) => (src, id, s, a, i + 1) }.toList
      assert(rows.toList.sortBy(_._5) == want,
        s"$src: selection must equal the sorted smallest-|margin| prefix")
    }
    assert(got.groupBy(_._1).forall(_._2.length == 10),
      "every sf0.01 source has >= 10 docs, so each batch is exactly k")
  }
}
