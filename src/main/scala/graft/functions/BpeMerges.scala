package graft.functions

/** A REAL byte-pair-encoding merge table: 200 rules produced by running
  * the standard BPE training loop (count adjacent symbol pairs across a
  * word-frequency-weighted corpus, merge the most frequent pair, repeat)
  * over an original English prose corpus committed alongside the
  * trainer's semantics in BpeSpec. Ties broke lexicographically, so the
  * table is deterministic and reproducible.
  *
  * Application semantics (shared by the Scala kernel in
  * [[TextFunctions.subwordCount]] and the DuckDB oracle chain from
  * [[oracleCtes]]): rules apply IN ORDER, each replacing every
  * left-to-right non-overlapping adjacent occurrence — the same pass
  * the trainer used to update its vocabulary, so corpus words reproduce
  * their training segmentation.
  */
object BpeMerges {
  val Rules: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("th", "e"), ("e", "n"), ("e", "r"),
    ("o", "r"), ("a", "n"), ("e", "s"), ("r", "e"), ("in", "g"),
    ("a", "t"), ("t", "o"), ("u", "n"), ("e", "d"), ("a", "l"),
    ("o", "f"), ("s", "t"), ("a", "c"), ("c", "o"), ("en", "t"),
    ("w", "or"), ("an", "d"), ("i", "t"), ("l", "e"), ("o", "n"),
    ("r", "o"), ("s", "e"), ("t", "er"), ("wor", "d"), ("a", "r"),
    ("g", "e"), ("i", "s"), ("w", "h"), ("d", "e"), ("en", "g"),
    ("i", "c"), ("it", "s"), ("m", "er"), ("r", "a"), ("un", "t"),
    ("word", "s"), ("b", "e"), ("co", "unt"), ("k", "en"), ("m", "ent"),
    ("p", "ro"), ("q", "u"), ("v", "er"), ("ac", "h"), ("c", "es"),
    ("g", "es"), ("i", "r"), ("m", "b"), ("m", "e"), ("o", "c"),
    ("p", "l"), ("p", "u"), ("s", "h"), ("to", "ken"), ("un", "its"),
    ("a", "ir"), ("a", "p"), ("a", "re"), ("b", "u"), ("c", "e"),
    ("c", "ed"), ("c", "or"), ("cor", "pu"), ("corpu", "s"), ("d", "oc"),
    ("d", "u"), ("doc", "u"), ("docu", "ment"), ("e", "ach"), ("es", "t"),
    ("f", "or"), ("i", "on"), ("i", "th"), ("ic", "h"), ("in", "to"),
    ("m", "at"), ("m", "o"), ("mer", "ges"), ("p", "air"), ("p", "e"),
    ("ra", "in"), ("s", "a"), ("s", "u"), ("t", "rain"), ("t", "ter"),
    ("wh", "ich"), ("a", "d"), ("a", "ge"), ("al", "l"), ("an", "y"),
    ("b", "y"), ("co", "m"), ("com", "m"), ("comm", "on"), ("count", "ing"),
    ("count", "s"), ("du", "ced"), ("eng", "l"), ("engl", "is"), ("englis", "h"),
    ("f", "ro"), ("fro", "m"), ("i", "l"), ("i", "st"), ("i", "z"),
    ("in", "e"), ("l", "ar"), ("le", "tter"), ("o", "w"), ("p", "i"),
    ("r", "un"), ("re", "al"), ("re", "qu"), ("sa", "me"), ("su", "b"),
    ("t", "a"), ("t", "e"), ("th", "at"), ("train", "ing"), ("u", "l"),
    ("u", "se"), ("u", "st"), ("w", "er"), ("w", "ith"), ("wor", "k"),
    ("a", "in"), ("a", "s"), ("a", "use"), ("a", "y"), ("ac", "ent"),
    ("ac", "ro"), ("acro", "s"), ("acros", "s"), ("ad", "j"), ("adj", "acent"),
    ("an", "g"), ("an", "s"), ("ang", "u"), ("angu", "age"), ("ar", "t"),
    ("art", "it"), ("artit", "ion"), ("b", "le"), ("be", "c"), ("bec", "ause"),
    ("c", "h"), ("c", "t"), ("ces", "s"), ("co", "l"), ("d", "ing"),
    ("de", "l"), ("de", "ter"), ("deter", "m"), ("determ", "in"), ("determin", "ist"),
    ("determinist", "ic"), ("e", "ces"), ("e", "ver"), ("en", "ce"), ("en", "d"),
    ("eng", "ine"), ("eng", "th"), ("est", "i"), ("esti", "mat"), ("ever", "y"),
    ("f", "e"), ("f", "requ"), ("for", "e"), ("frequ", "ent"), ("ge", "the"),
    ("gethe", "r"), ("h", "ow"), ("iz", "er"), ("l", "anguage"), ("l", "ength"),
    ("letter", "s"), ("m", "any"), ("m", "ust"), ("mat", "ter"), ("mb", "er"),
    ("mb", "o"), ("mbo", "l"), ("ment", "s"), ("mer", "ge"), ("mo", "del"),
    ("mo", "st"), ("n", "u"), ("nu", "mber"), ("o", "ver"), ("of", "t"),
    ("oft", "en"), ("p", "ac"), ("p", "artition"), ("pe", "at"), ("pi", "eces"))

  /** Merge one symbol sequence with one rule: left-to-right,
    * non-overlapping — identical to what a string `replace` does on the
    * wrapped form, which is how the SQL oracle replays it. */
  def applyRule(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** The merge table precompiled to dense integer symbol ids (r17):
    * symbols intern by STRING value (two merge paths yielding the same
    * text share one id, exactly string equality), rules become
    * (left, right, merged) id triples, and a rule whose operand text
    * is unreachable (not a-z and not produced by an earlier rule)
    * drops out — it could never fire, since a run only ever contains
    * reachable symbols. Lets [[countSubwords]] run each rule as one
    * in-place int-array pass instead of allocating a fresh
    * Array[String] per firing rule per run. */
  private val (ruleL, ruleR, ruleM, vocabSize) = {
    val vocab = scala.collection.mutable.HashMap.empty[String, Int]
    ('a' to 'z').foreach(c => vocab(c.toString) = vocab.size)
    val l = Array.newBuilder[Int]
    val r = Array.newBuilder[Int]
    val m = Array.newBuilder[Int]
    Rules.foreach { case (a, b) =>
      (vocab.get(a), vocab.get(b)) match {
        case (Some(ia), Some(ib)) =>
          val iab = vocab.getOrElseUpdate(a + b, vocab.size)
          l += ia; r += ib; m += iab
        case _ => () // operand unreachable — the rule is an identity
      }
    }
    (l.result(), r.result(), m.result(), vocab.size)
  }

  /** Subword count of one lowercase letter run under the full table —
    * the exact [[applyRule]] trajectory (BpeSpec replays it rule for
    * rule against the wrapped-replace formulation) over interned int
    * ids: one in-place pass per fireable rule, O(1) both-operands
    * presence guard (conservative — a merged-away symbol may stay
    * flagged, making the pass an identity scan, same as the old
    * `syms.contains` guard admitting a right-operand miss). */
  def countSubwords(run: String): Int = {
    var len = run.length
    if (len == 0) return 0
    val ids = new Array[Int](len)
    val present = new Array[Boolean](vocabSize)
    var i = 0
    while (i < len) {
      val id = run.charAt(i) - 'a'
      ids(i) = id; present(id) = true; i += 1
    }
    var k = 0
    while (k < ruleL.length) {
      val ia = ruleL(k)
      if (len > 1 && present(ia) && present(ruleR(k))) {
        val ib = ruleR(k)
        var w = 0; var j = 0; var merged = false
        while (j < len) {
          if (j + 1 < len && ids(j) == ia && ids(j + 1) == ib) {
            ids(w) = ruleM(k); merged = true; j += 2
          } else { ids(w) = ids(j); j += 1 }
          w += 1
        }
        len = w
        if (merged) present(ruleM(k)) = true
      }
      k += 1
    }
    len
  }

  /** The identical merge chain as staged DuckDB CTEs over `$src.$col`:
    * every letter wrapped as `(c)`, then one `replace` per rule in
    * order, at most `chunk` replaces nested per stage (DuckDB's binder
    * caps expression nesting at 128 — one flat 200-deep chain fails to
    * bind). Parentheses make adjacent matches share no boundary
    * characters, so SQL replace's left-to-right non-overlapping scan
    * is exactly [[applyRule]]. Returns the CTE text; the final
    * relation is [[oracleFinalRelation]] carrying the merged text in
    * column `bpe` plus every column of `src`. */
  def oracleCtes(src: String, col: String, chunk: Int = 50): String = {
    val wrapped =
      s"regexp_replace(regexp_replace(lower($col), '[^a-z]+', ' ', 'g'), '([a-z])', '(\\1)', 'g')"
    val groups = Rules.grouped(chunk).toSeq
    val sb = new StringBuilder(s"bpe0 AS (SELECT *, $wrapped AS bpe FROM $src)")
    groups.zipWithIndex.foreach { case (rs, gi) =>
      val chain = rs.foldLeft("bpe") { case (acc, (a, b)) =>
        s"replace($acc, '($a)($b)', '($a$b)')"
      }
      sb.append(s",\nbpe${gi + 1} AS (SELECT * REPLACE ($chain AS bpe) FROM bpe$gi)")
    }
    sb.toString
  }

  def oracleFinalRelation(chunk: Int = 50): String =
    s"bpe${Rules.grouped(chunk).size}"
}
