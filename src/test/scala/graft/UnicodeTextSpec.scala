package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashFunctions, PolyHash64Expr, UnicodeText}
import graft.functions.TextFunctions

/** Pins the repo-wide unicode text contract the r13 unicode-injection
  * axis established: lowercase = Unicode SIMPLE per-code-point mapping
  * (what DuckDB/utf8proc does), string iteration/counting = CODE
  * POINTS (what `length()`/`ord()` mean on both engines). The expected
  * strings below were read off DuckDB's `lower()` directly, so these
  * tests are the oracle-parity evidence without needing DuckDB in the
  * JVM suite.
  */
class UnicodeTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("simpleLower matches DuckDB lower() on the divergence probes") {
    // (input, DuckDB lower(input)) — verified against duckdb directly
    val cases = Seq(
      "ΑΣ ΚΟΣΜΟΣ" -> "ασ κοσμοσ", // final-sigma context: Java full gives ας
      "İSTANBUL" -> "istanbul", // Java full gives i+U+0307+stanbul (9 cps)
      "ışık" -> "ışık",
      "STRAẞE" -> "straße",
      "ß" -> "ß",
      "ＦＵＬＬ" -> "ｆｕｌｌ",
      "𝕊𝕡" -> "𝕊𝕡", // astral, no case mapping
      "MiXeD AsCiI 42!" -> "mixed ascii 42!")
    cases.foreach { case (in, want) =>
      assert(UnicodeText.simpleLower(in) == want, s"simpleLower($in)")
    }
  }

  test("the divergence is real: Java FULL casing splits from the simple mapping") {
    // the planted canary — if these ever start agreeing, the special
    // cases vanished from the JDK and the helper can be re-evaluated
    assert("ΑΣ".toLowerCase(java.util.Locale.ROOT) == "ας") // final sigma ς
    assert(UnicodeText.simpleLower("ΑΣ") == "ασ") // per-code-point σ
    assert("İ".toLowerCase(java.util.Locale.ROOT).length == 2) // i + U+0307
    assert(UnicodeText.simpleLower("İ") == "i")
  }

  test("PolyHash64.compute folds CODE POINTS (oracle's ord() unit), not UTF-16 chars") {
    val emoji = "😀" // U+1F600, one code point, two chars
    assert(PolyHash64Expr.compute(emoji) ==
      PolyHash64Expr.Seed * 31 + 0x1F600L)
    val charAtFold = PolyHash64Expr.Seed * 31 * 31 +
      0xd83dL * 31 + 0xde00L
    assert(PolyHash64Expr.compute(emoji) != charAtFold,
      "astral input must not hash as a surrogate pair")
    // ASCII/BMP unchanged vs the historical charAt fold — committed
    // hash values (classifier features, fingerprints) are stable
    assert(PolyHash64Expr.compute("abc") ==
      ((PolyHash64Expr.Seed * 31 + 'a') * 31 + 'b') * 31 + 'c')
  }

  test("SimpleLowerExpr (codegen'd) equals the static helper through a real plan") {
    val got = Seq("ΑΣ ΚΟΣΜΟΣ", "İSTANBUL", "Ab😀C", null)
      .toDF("s")
      .select(UnicodeText.simpleLowerCol(col("s")).as("l"))
      .as[String].collect().toSeq
    assert(got == Seq("ασ κοσμοσ", "istanbul", "ab😀c", null))
  }

  test("tokens / wordGramsDistinct / qualityCounters follow the contract") {
    val toks = Seq("ΑΣ İSTANBUL x")
      .toDF("s").select(TextFunctions.tokens(col("s")).as("t"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("ασ", "istanbul", "x"))

    // qualityCounters: n_chars and sum_tok_len are code points — an
    // astral emoji counts 1 (length() parity), not 2 (String.length)
    val q = Seq("a 😀😀 b")
      .toDF("s").select(TextFunctions.qualityCounters(col("s")).as("q"))
      .selectExpr("q.n_chars", "q.n_toks", "q.sum_tok_len")
      .as[(Int, Int, Long)].collect().head
    assert(q == ((6, 3, 4L)), s"got $q") // cps: a,sp,😀,😀,sp,b; tok lens 1+2+1
  }

  test("bpeLetterUnits runs are [a-z]+ over the SIMPLE-LOWERED text (oracle order)") {
    import graft.functions.BpeMerges
    // 'İNGEST': the oracle lowercases FIRST, so its letter run is
    // "ingest" (2 merge units); extracting [a-zA-Z]+ from the raw
    // text gives "NGEST" → "ngest" (3 units) — the order of
    // operations is observable under the committed merge table (the
    // r13 review's catch; the unicodify snippet 'İSTANBUL' passes by
    // coincidence — equal counts both ways — which is why the axis
    // run stayed green over the live defect)
    val anti = BpeMerges.countSubwords("ingest") != BpeMerges.countSubwords("ngest")
    assert(anti, "fixture became vacuous: pick a word whose İ-run diverges")
    val got = Seq("İNGEST").toDF("s")
      .select(TextFunctions.subwordCount(col("s")).as("n"))
      .as[Int].collect().head
    // letters as ONE lowered run + İ itself counted by the punct term
    assert(got == BpeMerges.countSubwords("ingest") + 1, s"got $got")
  }

  test("text_script_mix flags the homoglyph-spam shape (planted fixture)") {
    // "pаypal" with a CYRILLIC а (U+0430) — visually identical to the
    // latin word, the classic phishing/spam signature this query's
    // is_mixed flag exists for; plus pure-latin and pure-CJK controls
    // that must NOT flag
    val df = Seq(
      (1L, "pаypal login"), // latin + cyrillic -> mixed
      (2L, "plain ascii text 42"), // latin only
      (3L, "你好 世界"), // cjk only
      (4L, null.asInstanceOf[String])) // empty-doc contract: all zeros
      .toDF("doc_id", "text")
      .createOrReplaceTempView("documents_fixture")
    val q = graft.queries.TextQueries.queries("text_script_mix")
    // run the registered query against a temp snapshot of the fixture
    val dir = java.nio.file.Files.createTempDirectory("scriptmix").toString
    spark.sql("select * from documents_fixture")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = q(spark, dir)
      .select("doc_id", "n_cp", "n_latin", "n_cjk", "n_cyrillic", "is_mixed")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out(0) == ((1L, 12L, 10L, 0L, 1L, 1L)), s"homoglyph doc: ${out(0)}")
    assert(out(1)._6 == 0L && out(1)._2 == 19L, s"latin-only control: ${out(1)}")
    assert(out(2) == ((3L, 5L, 0L, 4L, 0L, 0L)), s"cjk-only control: ${out(2)}")
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L, 0L)), s"null text is the empty doc: ${out(3)}")
  }

  test("wordShingleHashes folds gram code points like the oracle's ord() replay") {
    val hs = Seq("😀 b c")
      .toDF("s").select(HashFunctions.wordShingleHashes(col("s"), 3).as("h"))
      .as[Seq[Long]].collect().head
    var h = 1125899906842597L
    h = h * 31 + 0x1F600L; h = h * 31 + ' '
    h = h * 31 + 'b'; h = h * 31 + ' '
    h = h * 31 + 'c'; h = h * 31 + ' '
    assert(hs == Seq(HashFunctions.splitmix64(h)))
  }

  test("Spark levenshtein is code-point based — the edit-distance contract the oracles replay") {
    // DuckDB's builtin levenshtein is BYTE-based (café/cafe = 2,
    // a😀b/ab = 4); the library pins CODE-POINT semantics (edits on
    // characters, not encoding units) and the q_fuzzy_name_pairs /
    // q_entity_resolution oracles replay a code-point DP
    // (MiscQueries.cpLevSql) instead. This pins the Spark half; the
    // unicodify.py p_name arm (pairs at cp-distance ≤4 but byte
    // distance >4) grades the composition end-to-end.
    val got = Seq(("café", "cafe"), ("你好", "你坏"), ("a😀b", "ab"),
      ("kitten", "sitting"), ("", "ab"), ("İ", "i"))
      .toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == Seq(1, 1, 1, 3, 2, 1),
      s"levenshtein must count code-point edits: $got")
  }

  test("lowerCp equals DuckDB lower() on EVERY code point (committed-checksum sweep)") {
    // The committed constant is the fold of DuckDB 1.0's
    // lower(chr(cp)) table over all 1,112,063 non-surrogate code
    // points (generated by an exhaustive cross-engine sweep; see
    // UnicodeText.lowerCp). Recomputing it from the JVM side proves
    // the kernel's mapping — Character.toLowerCase plus the three
    // pinned utf8proc identity exceptions — agrees with the oracle
    // everywhere, and turns a silent JDK Unicode-table upgrade into a
    // loud failure.
    var h = 1125899906842597L
    var n = 0
    var cp = 1
    while (cp <= 0x10FFFF) {
      if (cp < 0xD800 || cp > 0xDFFF) {
        h = h * 31 + cp
        h = h * 31 + UnicodeText.lowerCp(cp)
        n += 1
      }
      cp += 1
    }
    assert(n == 1112063)
    assert(h == UnicodeText.LowerMapChecksum,
      s"per-code-point lowercase mapping drifted from the committed DuckDB table: $h")
    // the three pinned exceptions: Unicode 13 lowercase forms the JDK
    // knows but utf8proc doesn't — parity pins identity
    for (e <- Seq(0xA7C7, 0xA7C9, 0xA7F5)) {
      assert(UnicodeText.lowerCp(e) == e)
      assert(Character.toLowerCase(e) == e + 1, "JDK drift: exception no longer needed?")
    }
  }
}
