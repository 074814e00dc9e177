package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo-wide unicode text contract (r13 unicode-injection axis).
  *
  * Lowercasing is the Unicode SIMPLE (per-code-point) mapping —
  * `Character.toLowerCase(int)` — NOT `String.toLowerCase`, and string
  * iteration is by CODE POINT, not UTF-16 char. Three reasons:
  *
  *   1. **Oracle parity.** DuckDB (utf8proc) lowercases per code point
  *      and `ord`/`length`/`substr` count code points. Java's
  *      String.toLowerCase applies SpecialCasing — context-sensitive
  *      final sigma (ΑΣ → ας vs utf8proc's ασ) and one-to-many İ →
  *      i+U+0307 (utf8proc: i) — so any kernel using it silently
  *      diverges from its oracle the moment real multilingual text
  *      arrives (the unicode axis caught exactly this).
  *   2. **Determinism at scale.** Simple mapping is context-free and
  *      locale-free: a token's fingerprint never depends on what
  *      follows it or on executor JVM locale — the property a 100 TB
  *      dedup/fingerprint tier actually needs. (Bare
  *      `String.toLowerCase()` is locale-sensitive: a tr_TR executor
  *      would map I → ı and split fleet hashes.)
  *   3. **Stock-corpus compatibility.** For ASCII the simple and full
  *      mappings coincide and code point == UTF-16 char, so every
  *      committed hash/token value is unchanged.
  */
object UnicodeText {

  /** Unicode simple lowercase: per-code-point Character.toLowerCase.
    * This sits on the repo's hottest per-row paths (tokens, shingle
    * hashing, qualityCounters, the codegen'd SimpleLowerExpr), so the
    * dominant case — already-lowercase ASCII — is ONE scan returning
    * `s` unchanged; work begins only at the first char that needs any
    * (an uppercase ASCII letter or a non-ASCII code point). */
  def simpleLower(s: String): String = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80 || (c >= 'A' && c <= 'Z')) return lowerFrom(s, i)
      i += 1
    }
    s
  }

  /** The per-code-point lowercase mapping the ORACLE computes —
    * `Character.toLowerCase` with three pinned exceptions. An
    * exhaustive sweep of every code point (this session: DuckDB 1.0
    * `lower(chr(cp))` vs JDK 17) found the two engines' simple
    * mappings disagree at exactly U+A7C7, U+A7C9, U+A7F5: Unicode 13
    * gave them lowercase forms, the JDK's tables have them, DuckDB's
    * utf8proc (older Unicode) maps them to themselves. Oracle parity
    * pins identity. UnicodeTextSpec replays the WHOLE sweep against a
    * committed checksum of the DuckDB table, so a JDK upgrade that
    * shifts ANY of the 1,112,063 mappings fails loudly instead of
    * splitting engines silently (r13 ADVICE). */
  @inline def lowerCp(cp: Int): Int =
    if (cp == 0xA7C7 || cp == 0xA7C9 || cp == 0xA7F5) cp
    else Character.toLowerCase(cp)

  /** Fold of (cp, lowerCp(cp)) over every non-surrogate code point
    * 1..0x10FFFF ascending, h ← h·31 + v — must equal the committed
    * checksum of DuckDB's lower() table. */
  val LowerMapChecksum: Long = -7970205441607196691L

  /** Slow half: chars before `start` are verbatim; decide once whether
    * the remainder is pure ASCII (char-array fold) or needs the
    * code-point walk. */
  private def lowerFrom(s: String, start: Int): String = {
    var j = start
    var ascii = true
    while (ascii && j < s.length) {
      if (s.charAt(j) >= 0x80) ascii = false
      j += 1
    }
    if (ascii) {
      val out = s.toCharArray
      var k = start
      while (k < s.length) {
        val c = out(k)
        if (c >= 'A' && c <= 'Z') out(k) = (c + 32).toChar
        k += 1
      }
      new String(out)
    } else {
      val sb = new java.lang.StringBuilder(s.length)
      sb.append(s, 0, start)
      var k = start
      while (k < s.length) {
        val cp = s.codePointAt(k)
        sb.appendCodePoint(lowerCp(cp))
        k += Character.charCount(cp)
      }
      sb.toString
    }
  }

  /** Code-point count (what `length()` means on BOTH engines). */
  def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** The repo-wide WHITESPACE contract: RE2's `\s` = [\t\n\f\r ] —
    * what every DuckDB-oracle regex means by whitespace. Java's regex
    * `\s` ALSO matches U+000B (vertical tab), so a bare "\\s" in a
    * Spark-side regex silently diverges from its oracle on the first
    * document containing one (r13 ADVICE); every Spark-side
    * tokenizer/counter spells this class out instead. (Both engines'
    * `\s` is ASCII-only — NBSP/ideographic space never split — so the
    * ONLY divergent code point was U+000B.) unicodify.py's \x0B
    * snippet grades the contract. */
  val WsClass = " \\t\\n\\f\\r"

  /** `\s+` under the contract — the token-split regex. */
  val WsPlus = s"[$WsClass]+"

  /** Is `c` contract whitespace? (The char-kernel twin of [[WsClass]].) */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Contract tokenization in one allocation-lean scan: the maximal
    * runs of non-[[isWs]] chars, in order — bit-identical to
    * `s.split(WsPlus).filter(_.nonEmpty)` (runs between `[\s]+`
    * separators ARE the non-ws runs; split's leading "" falls to the
    * filter). Exists because `String.split(regex)` re-compiles the
    * Pattern on EVERY call for any multi-char regex (its fast path is
    * single-literal-char only), and that sat on the per-row path of
    * every tokenizing kernel in the engine (r17). */
  def wsTokens(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        val st = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        out += s.substring(st, i)
      }
    }
    out.result()
  }

  /** Static kernel for the codegen'd expression below. */
  def simpleLowerUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(simpleLower(s.toString))

  /** Column entry point: codegen'd simple-lowercase (the PolyHash64Expr
    * pattern — a static call inlined into whole-stage codegen), for the
    * few query sites that need oracle-parity casing on a raw column
    * without paying a ScalaUDF boundary. */
  def simpleLowerCol(c: Column): Column =
    GraftColumnBridge.column(SimpleLowerExpr(GraftColumnBridge.expression(c)))
}

/** `lower()` under the Unicode simple mapping — see [[UnicodeText]]. */
case class SimpleLowerExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simple_lower"

  override def nullSafeEval(s: Any): Any =
    UnicodeText.simpleLowerUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeText.simpleLowerUtf8($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
