package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EmbeddingVectors

/** Pins the committed learned embeddings the way BpeSpec pins the merge
  * table and ClassifierSpec pins the perceptron: re-run the full
  * trainer over the committed corpus and assert it reproduces the
  * shipped table EXACTLY — the asset is a function of public inputs in
  * this repo, not an opaque blob. Plus the two properties downstream
  * queries depend on: full coverage of the documents-table vocabulary,
  * and learned (not planted) topical structure.
  */
class EmbeddingSpec extends AnyFunSuite {

  test("the committed 45x8 table is exactly what training on the committed corpus produces") {
    val trained = EmbeddingTrainer.train(EmbeddingTrainer.committedCorpus())
    assert(EmbeddingTrainer.Dim == EmbeddingVectors.Dim)
    assert(EmbeddingTrainer.Scale == EmbeddingVectors.Scale)
    assert(trained.size == EmbeddingVectors.Vectors.size,
      s"trained ${trained.size} words, committed ${EmbeddingVectors.Vectors.size}")
    val diverge = trained.zip(EmbeddingVectors.Vectors).indexWhere(t => t._1 != t._2)
    assert(trained == EmbeddingVectors.Vectors,
      s"first divergence at word index $diverge: " +
        s"trained=${trained.lift(diverge)}, committed=${EmbeddingVectors.Vectors.lift(diverge)}")
  }

  test("every documents-table word has a vector (no OOV in the graded corpus)") {
    val docWords = Set("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line", "merge",
      "order", "part", "query", "row", "scan", "slow", "small", "sort", "spark",
      "stream", "table", "the", "value", "vector", "window")
    val have = EmbeddingVectors.Vectors.map(_._1).toSet
    assert((docWords -- have).isEmpty, s"missing vectors: ${docWords -- have}")
  }

  test("learned structure: topical neighbors beat cross-topic pairs") {
    val v = EmbeddingVectors.Vectors.toMap
    def cos(a: String, b: String): Double = {
      val (x, y) = (v(a), v(b))
      val dot = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      dot / math.sqrt(x.map(p => p.toDouble * p).sum * y.map(p => p.toDouble * p).sum)
    }
    val topical = Seq("group" -> "agg", "join" -> "key", "join" -> "hash",
      "scan" -> "filter")
    val cross = Seq("window" -> "hash", "filter" -> "merge", "agg" -> "line")
    val minTop = topical.map { case (a, b) => cos(a, b) }.min
    val maxCross = cross.map { case (a, b) => cos(a, b) }.max
    assert(minTop > 0.3, s"topical pairs should be similar, min=$minTop")
    assert(minTop > maxCross,
      s"every topical pair must beat every cross-topic pair ($minTop vs $maxCross)")
  }

  test("dim 0 is the all-positive dominant component (the sign-bucket design premise)") {
    // dedup_learned_semantic's sign buckets start at dim 1 BECAUSE the
    // leading eigenvector of a non-negative PPMI matrix is
    // non-negative (Perron-Frobenius) — verify the committed table
    // honors that, and that dims 1-3 genuinely split the vocabulary
    assert(EmbeddingVectors.Vectors.forall(_._2.head >= 0L), "dim 0 must be non-negative")
    for (d <- 1 to 3) {
      val signs = EmbeddingVectors.Vectors.map(_._2(d) > 0L).toSet
      assert(signs.size == 2, s"dim $d carries no sign split")
    }
  }
}
