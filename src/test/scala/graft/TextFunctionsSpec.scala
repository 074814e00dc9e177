package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.get(4)
}

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wordGramsDistinct equals array_distinct(wordNgrams(tokens(text))) — the declarative reference it replaced") {
    import org.apache.spark.sql.functions._
    // the one-pass kernel exists because the declarative chain goes
    // O(tokens²) when pushdown substitutes the tokenizer into the gram
    // lambda (r12 giant-doc finding); this pin keeps the two
    // semantically identical: edge cases (null, empty, under-N tokens,
    // runs of whitespace, mixed case, repeated grams) plus the real
    // sf0.001 corpus, compared as SETS per doc and as exact arrays
    val edge = Seq(
      (1L, "a b c d e f g"), (2L, null.asInstanceOf[String]), (3L, ""),
      (4L, "one two three four"), // under 5 tokens -> empty
      (5L, "  A  b\tC   d E a b c d e  "),
      (6L, "x x x x x x x x x x")) // repeated gram dedups
      .toDF("doc_id", "text")
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    Seq(edge, real).foreach { df =>
      val both = df.select(col("doc_id"),
          wordGramsDistinct(col("text"), 5).as("fast"),
          array_distinct(wordNgrams(tokens(coalesce(col("text"), lit(""))), 5)).as("ref"))
        .as[(Long, Seq[String], Seq[String])].collect()
      both.foreach { case (id, fast, ref) =>
        assert(fast == ref, s"doc $id: kernel and declarative grams must be identical arrays")
      }
      assert(both.exists(_._2.nonEmpty), "anti-vacuity: some doc must produce grams")
    }
  }

  test("normalizeStr strips punctuation, trims, lowercases, nulls empties") {
    val got = Seq("  Hello, World! ", "???", "A-B c", "")
      .toDF("s").select(normalizeStr($"s").as("n")).as[String].collect()
    assert(got.toSeq == Seq("hello world", null, "ab c", null))
  }

  test("normalizeTopics dedups, drops >30 chars and empties") {
    val got = Seq((Seq("Graph  Mining!", "graph  mining", "x" * 31, "!!"), 1))
      .toDF("a", "i").select(normalizeTopics($"a").as("n"))
      .as[(Seq[String])].collect().head
    assert(got == Seq("graph  mining"))
  }

  test("tokens/tokenCount/subwordCount") {
    val df = Seq("The quick  brown fox-jumps! 42 times").toDF("s")
    val (n, sw) = df.select(tokenCount($"s"), subwordCount($"s")).as[(Int, Int)].collect().head
    assert(n == 6)
    // BPE units per letter run (real merge table): the=1 qu/ic/k=3
    // b/ro/w/n=4 f/o/x=3 j/u/m/p/s=5 t/i/m/es=4 → 20; digits: 42 = 1;
    // punct: - ! = 2
    assert(sw == 23)
  }

  test("BPE merges: table-trained words collapse, unseen words split toward chars") {
    import graft.functions.BpeMerges
    // corpus words reproduce their training segmentation
    assert(BpeMerges.countSubwords("the") == 1)
    assert(BpeMerges.countSubwords("counting") == 1)
    assert(BpeMerges.countSubwords("deterministic") == 1)
    // unseen word: merges only via generic pairs (x/y/l/o/p/h/on/e)
    assert(BpeMerges.countSubwords("xylophone") == 8)
    // the merge table is well-formed: every rule's symbols are
    // producible (single chars or the output of an EARLIER rule), so
    // no rule is dead by construction
    val producible = collection.mutable.Set[String]()
    ('a' to 'z').foreach(c => producible += c.toString)
    BpeMerges.Rules.foreach { case (a, b) =>
      assert(producible(a) && producible(b), s"rule ($a,$b) uses unproducible symbol")
      producible += (a + b)
    }
    // applyRule is left-to-right non-overlapping (the SQL replace scan)
    assert(BpeMerges.applyRule(Array("l", "l", "l"), "l", "l").toSeq == Seq("ll", "l"))
    assert(BpeMerges.applyRule(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
  }

  test("charNgrams and wordNgrams handle short inputs") {
    val df = Seq(("ab", Seq("a", "b"))).toDF("s", "t")
    val (cg, wg) = df.select(charNgrams($"s", 3), wordNgrams($"t", 3))
      .as[(Seq[String], Seq[String])].collect().head
    assert(cg.isEmpty && wg.isEmpty)
    val cg2 = Seq("abcd").toDF("s").select(charNgrams($"s", 2)).as[Seq[String]].collect().head
    assert(cg2 == Seq("ab", "bc", "cd"))
    val wg2 = Seq(Seq("a", "b", "c")).toDF("t").select(wordNgrams($"t", 2)).as[Seq[String]].collect().head
    assert(wg2 == Seq("a b", "b c"))
  }

  test("quality ratios are in range and deterministic") {
    val df = Seq("the cat sat on the mat!", "", "xxxxxxxxxxxxxxxxxxxxxxxx").toDF("s")
    val rows = df.select(stopwordRatio($"s"), punctRatio($"s"), meanTokenLen($"s"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (sr, pr, _) =>
      assert(sr >= 0 && sr <= 1); assert(pr >= 0 && pr <= 1)
    }
    assert(rows(0)._1 == 3.0 / 6.0) // the, on, the
  }

  test("fingerprint is order-sensitive and stable on normalized text") {
    val fps = Seq("a b c", "c b a", "a  b   c").toDF("s")
      .select(fingerprint($"s")).as[Long].collect()
    assert(fps(0) != fps(1))   // order matters
    assert(fps(0) == fps(2))   // whitespace runs don't
  }

  test("repetitionRatio and redact") {
    val rr = Seq("a a a b", "a b c d", "").toDF("s")
      .select(repetitionRatio($"s")).as[Double].collect()
    assert(rr(0) == 0.5 && rr(1) == 0.0 && rr(2) == 0.0)
    val red = Seq("mail me at a.b@x.com or call 12345678")
      .toDF("s").select(redact($"s")).as[String].collect().head
    assert(red == "mail me at [REDACTED] or call [REDACTED]")
  }

  test("langId picks marker-heavy language") {
    val got = Seq("the cat and the dog is here", "el que la los de")
      .toDF("s").select(langId($"s")).as[String].collect()
    assert(got.toSeq == Seq("en", "es"))
  }
}
