package graft

/** The REAL embedding trainer behind `functions/EmbeddingVectors.scala`
  * — count-based distributional semantics, the classic pre-neural
  * pipeline (Levy & Goldberg 2014 showed SGNS factorizes exactly this
  * matrix): sentence-windowed co-occurrence counts → positive PMI →
  * rank-`dim` symmetric eigen-factorization → rows scaled by √λ are
  * the word vectors.
  *
  * Every step is DETERMINISTIC so EmbeddingSpec can re-run this and
  * assert it reproduces the committed table bit-exactly (the BpeSpec /
  * ClassifierSpec discipline for committed trained assets): vocabulary
  * order is lexicographic, co-occurrence accumulation follows file
  * order, the eigensolver is fixed-iteration power iteration with
  * deflation seeded by an integer LCG (no Random, no convergence
  * thresholds), eigenvector sign is fixed by the largest-|component|
  * rule, and the shipped vectors quantize to integers at a fixed
  * scale. Pure double arithmetic in a fixed evaluation order is
  * reproducible across JVMs.
  */
object EmbeddingTrainer {

  val Dim = 8
  val Window = 2
  val MinCount = 4
  val Iters = 60
  val Scale = 1000000L

  def train(corpus: String): Seq[(String, Seq[Long])] = {
    val lines = corpus.split("\n").toSeq
      .map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    lines.foreach(_.foreach(w => counts.update(w, counts.getOrElse(w, 0) + 1)))
    val vocab = counts.filter(_._2 >= MinCount).keys.toSeq.sorted
    val idx = vocab.zipWithIndex.toMap
    val v = vocab.size

    // sentence-bounded symmetric co-occurrence, window ±Window
    val cooc = Array.ofDim[Double](v, v)
    for (line <- lines; i <- line.indices; j <- (i + 1) to math.min(i + Window, line.size - 1)) {
      (idx.get(line(i)), idx.get(line(j))) match {
        case (Some(a), Some(b)) => cooc(a)(b) += 1.0; cooc(b)(a) += 1.0
        case _ =>
      }
    }
    val row = Array.tabulate(v)(i => cooc(i).sum)
    val total = row.sum

    // positive PMI — the sparsity-and-frequency correction that makes
    // raw counts factorizable into useful directions
    val m = Array.tabulate(v, v) { (i, j) =>
      if (cooc(i)(j) <= 0.0 || row(i) <= 0.0 || row(j) <= 0.0) 0.0
      // StrictMath, not Math: Math.log is only 1-ulp-accurate and
      // platform-intrinsic-dependent, which would break the committed
      // table's bit-reproducibility across JVMs; StrictMath is defined
      // by fdlibm everywhere (sqrt is IEEE-exact either way)
      else math.max(0.0, StrictMath.log(cooc(i)(j) * total / (row(i) * row(j))))
    }

    // top-Dim POSITIVE eigenpairs by fixed-iteration power iteration +
    // deflation. PPMI is symmetric but not PSD, so power iteration can
    // converge to a negative eigenvalue (largest |λ|); those directions
    // carry no √λ-scaled coordinate — deflate them away and keep
    // hunting until Dim positive components are banked (bounded
    // attempts, deterministic).
    val emb = Array.ofDim[Double](v, Dim)
    var banked = 0
    var c = 0
    while (banked < Dim && c < 4 * Dim) {
      // deterministic LCG init: never the zero vector, generically not
      // orthogonal to the dominant eigenvector
      var vec = Array.tabulate(v) { i =>
        val x = (i.toLong * 2654435761L + c.toLong * 40503L + 12345L) & 0x7fffffffL
        x.toDouble / 0x80000000L.toDouble - 0.5
      }
      var it = 0
      var dead = false
      while (it < Iters && !dead) {
        val w = Array.tabulate(v) { i =>
          var s = 0.0; var j = 0
          while (j < v) { s += m(i)(j) * vec(j); j += 1 }
          s
        }
        val n = math.sqrt(w.map(x => x * x).sum)
        if (n == 0.0) { dead = true; vec = Array.fill(v)(0.0) }
        else vec = w.map(_ / n)
        it += 1
      }
      val lambda =
        if (dead) 0.0
        else {
          var s = 0.0
          for (i <- 0 until v; j <- 0 until v) s += vec(i) * m(i)(j) * vec(j)
          s
        }
      // sign convention: largest-|component| entry (first on ties) is
      // non-negative — eigenvectors are sign-ambiguous otherwise
      if (!dead) {
        var mi = 0
        for (i <- 1 until v) if (math.abs(vec(i)) > math.abs(vec(mi))) mi = i
        if (vec(mi) < 0) vec = vec.map(-_)
      }
      for (i <- 0 until v; j <- 0 until v) m(i)(j) -= lambda * vec(i) * vec(j)
      if (lambda > 0.0) {
        val f = math.sqrt(lambda)
        for (i <- 0 until v) emb(i)(banked) = f * vec(i)
        banked += 1
      }
      c += 1
    }
    require(banked == Dim,
      s"only $banked positive eigencomponents in ${4 * Dim} attempts")

    vocab.zipWithIndex.map { case (w, i) =>
      w -> emb(i).map(x => math.round(x * Scale)).toSeq
    }
  }

  def committedCorpus(): String = {
    val in = getClass.getResourceAsStream("/embedding_corpus.txt")
    require(in != null, "embedding_corpus.txt missing from test resources")
    scala.io.Source.fromInputStream(in, "UTF-8").mkString
  }

  /** One-off generator for the committed table (run once, paste into
    * functions/EmbeddingVectors.scala; EmbeddingSpec then pins it). */
  def main(args: Array[String]): Unit = {
    val t = train(committedCorpus())
    println(s"  // ${t.size} words x $Dim dims, scale $Scale")
    t.foreach { case (w, vs) =>
      println(s"""    ("$w", Seq(${vs.mkString("L, ")}L)),""")
    }
  }
}
