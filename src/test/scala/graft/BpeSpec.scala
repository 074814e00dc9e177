package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeMerges

/** Re-runs the full BPE training loop over the committed corpus
  * (src/test/resources/bpe_corpus.txt) and asserts it reproduces
  * BpeMerges.Rules EXACTLY — the committed table is a real learned
  * asset, not an authored list: anyone can regenerate it from the
  * corpus with the standard algorithm.
  */
class BpeSpec extends AnyFunSuite {

  private def train(text: String, steps: Int): Seq[(String, String)] = {
    val words = "[a-z]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toSeq
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[String, Array[String]] =
      freq.keys.map(w => w -> w.split("").filter(_.nonEmpty)).toMap
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < steps && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (w, syms) =>
        val f = freq(w)
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        // deterministic: max count, ties to the lexicographically
        // smallest pair — the committed table's declared tie-break
        val bestCount = pairs.values.max
        // NB: .toSeq BEFORE collect — collecting tuples straight off a
        // Map rebuilds a Map and silently drops tied candidates that
        // share a left symbol
        val (a, b) = pairs.toSeq.filter(_._2 == bestCount).map(_._1).sorted.head
        merges += ((a, b))
        vocab = vocab.map { case (w, syms) => w -> BpeMerges.applyRule(syms, a, b) }
        step += 1
      }
    }
    merges.result()
  }

  test("the committed 200-rule table is exactly what training on the committed corpus produces") {
    val in = getClass.getResourceAsStream("/bpe_corpus.txt")
    assert(in != null, "bpe_corpus.txt missing from test resources")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    val trained = train(text, 200)
    assert(trained.size == 200)
    assert(trained == BpeMerges.Rules,
      s"first divergence at rule ${trained.zip(BpeMerges.Rules).indexWhere(t => t._1 != t._2)}")
  }

  test("countSubwords equals the wrapped-replace formulation rule for rule") {
    // independent reimplementation via literal string replace on the
    // wrapped form — the exact computation the DuckDB oracle performs
    def viaReplace(run: String): Int = {
      var s = run.split("").filter(_.nonEmpty).map(c => s"($c)").mkString
      BpeMerges.Rules.foreach { case (a, b) =>
        s = s.replace(s"($a)($b)", s"($a$b)")
      }
      s.count(_ == '(')
    }
    val probe = Seq("the", "training", "xylophone", "counting", "a",
      "zzz", "requirements", "lll", "abab")
    probe.foreach { w =>
      assert(BpeMerges.countSubwords(w) == viaReplace(w),
        s"kernel and replace-chain disagree on '$w'")
    }
  }
}
