package core

import java.util.Locale
import java.util.regex.Pattern

/** Normative text statistics (SURVEY.md §3.3 definitions). These functions
  * are THE semantics; the Spark Column tier re-expresses them with the same
  * java.util.regex patterns (Spark's regexp_* run java.util.regex too) and
  * equality is enforced by property tests (SURVEY.md §6.3(d)).
  *
  * All rules operate on `textN = if (text == null) "" else text` — the null
  * normalization is pinned here so oracle and pipeline agree on null inputs.
  */
object TextStats {
  /** Word separator, normative Java regex (SURVEY.md §3.3). */
  final val WordSep = "[^\\p{L}\\p{N}]+"
  /** Symbol = not letter, not digit, not whitespace (one code point). */
  final val SymbolRe = "[^\\p{L}\\p{N}\\s]"
  /** ASCII digit (pinned: NOT \\d-with-unicode, NOT \\p{N}). */
  final val DigitRe = "[0-9]"

  private val wordSepP = Pattern.compile(WordSep)
  private val symbolP  = Pattern.compile(SymbolRe)
  private val digitP   = Pattern.compile(DigitRe)

  def norm(text: String): String = if (text == null) "" else text

  /** Unicode code-point count == Spark `length()` on UTF8String. */
  def cpLen(text: String): Int = {
    val t = norm(text)
    t.codePointCount(0, t.length)
  }

  /** Lowercased words, empties removed (SURVEY.md §3.3 `words`). */
  def words(text: String): Array[String] =
    wordSepP.split(norm(text).toLowerCase(Locale.ROOT)).filter(_.nonEmpty)

  def wordCount(text: String): Int = words(text).length

  /** Consecutive word bigrams joined by a single space. */
  def bigrams(ws: Array[String]): Array[String] =
    if (ws.length < 2) Array.empty
    else Array.tabulate(ws.length - 1)(i => ws(i) + " " + ws(i + 1))

  /** 1 − distinct(bigrams)/total(bigrams); 0.0 when no bigrams. */
  def repRatio(text: String): Double = {
    val bg = bigrams(words(text))
    if (bg.isEmpty) 0.0
    else 1.0 - bg.distinct.length.toDouble / bg.length.toDouble
  }

  def bigramCount(text: String): Int = {
    val n = wordCount(text); if (n < 2) 0 else n - 1
  }

  private def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  /** #code points that are neither letter nor digit nor whitespace. */
  def symbolCount(text: String): Int = countMatches(symbolP, norm(text))

  def symbolRatio(text: String): Double = {
    val n = cpLen(text)
    if (n == 0) 0.0 else symbolCount(text).toDouble / n.toDouble
  }

  def digitCount(text: String): Int = countMatches(digitP, norm(text))

  def digitRatio(text: String): Double = {
    val n = cpLen(text)
    if (n == 0) 0.0 else digitCount(text).toDouble / n.toDouble
  }

  /** All per-text statistics the rule set needs, in one pass. */
  final case class Stats(
      cp: Int, nWords: Int, nBigrams: Int, nBigramsDistinct: Int,
      symbols: Int, digits: Int)

  /** Code-point class tests matching the java.util.regex classes used in
    * the normative patterns EXACTLY (property-tested against regexp_count
    * on adversarial unicode):
    * \p{L} = categories Lu Ll Lt Lm Lo == Character.isLetter;
    * \p{N} = Nd Nl No;
    * \s (no UNICODE flag) = [ \t\n\x0B\f\r].
    */
  @inline private def isL(cp: Int): Boolean = Character.isLetter(cp)
  @inline private def isN(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }
  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  /** One-pass stats computation (the hot-path entry point: the Spark
    * codegen expression tier calls THIS, so pipeline and oracle share the
    * identical implementation). Counting is a single code-point loop —
    * equality with the regex-based functions above is enforced by
    * PropertyEqualitySpec and the `stats == parts` core test.
    */
  def stats(text: String): Stats = {
    val t = norm(text)
    // words are defined over the LOWERCASED text (normative, §3.3).
    // Words are tracked as (start, end) SPANS into `lower` — no substring
    // allocation per word — and the distinct-bigram count runs over span
    // pairs with an open-addressed probe table comparing chars in place.
    // A bigram string is w1+" "+w2 and words never contain spaces, so
    // string equality ⟺ both word spans equal char-for-char; the count is
    // identical to the old HashSet-of-concatenated-strings (asserted by
    // the existing stats==parts and property suites), minus ~2 allocations
    // per word and per bigram (measured 9.5 → ~5 µs/row on fixture text).
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    var bounds = new Array[Int](64) // (start, end) pairs
    var nW = 0
    var i = 0
    var wordStart = -1
    def addWord(s: Int, e: Int): Unit = {
      if (nW * 2 == bounds.length)
        bounds = java.util.Arrays.copyOf(bounds, bounds.length * 2)
      bounds(nW * 2) = s
      bounds(nW * 2 + 1) = e
      nW += 1
    }
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      val n = Character.charCount(cp)
      if (isL(cp) || isN(cp)) { if (wordStart < 0) wordStart = i }
      else if (wordStart >= 0) { addWord(wordStart, i); wordStart = -1 }
      i += n
    }
    if (wordStart >= 0) addWord(wordStart, lower.length)
    val nBg = if (nW < 2) 0 else nW - 1
    val nBgd = if (nBg == 0) 0 else distinctBigrams(lower, bounds, nW)
    // symbol/digit/cp counts over the ORIGINAL (non-lowered) text
    var cp2 = 0; var sym = 0; var dig = 0
    i = 0
    while (i < t.length) {
      val c = t.codePointAt(i)
      cp2 += 1
      if (!isL(c) && !isN(c) && !isWs(c)) sym += 1
      if (c >= '0' && c <= '9') dig += 1
      i += Character.charCount(c)
    }
    Stats(cp2, nW, nBg, nBgd, sym, dig)
  }

  /** Count distinct adjacent word pairs over `bounds` spans into `s` —
    * open addressing with linear probing; slots store the bigram's first
    * word index + 1 (0 = empty). Hash and equality read the chars of both
    * spans directly, so no strings are built.
    */
  private def distinctBigrams(s: String, bounds: Array[Int], nW: Int): Int = {
    val nBg = nW - 1
    var cap = 4
    while (cap < nBg * 2) cap <<= 1
    val table = new Array[Int](cap)
    val mask = cap - 1
    def bigramHash(k: Int): Int = {
      var h = 1
      var p = bounds(2 * k)
      val e1 = bounds(2 * k + 1)
      while (p < e1) { h = h * 31 + s.charAt(p); p += 1 }
      h = h * 31 + ' '
      p = bounds(2 * k + 2)
      val e2 = bounds(2 * k + 3)
      while (p < e2) { h = h * 31 + s.charAt(p); p += 1 }
      h
    }
    def spanEq(a: Int, b: Int): Boolean = { // word index a vs b
      val sa = bounds(2 * a); val ea = bounds(2 * a + 1)
      val sb = bounds(2 * b); val eb = bounds(2 * b + 1)
      if (ea - sa != eb - sb) return false
      var p = 0
      val len = ea - sa
      while (p < len) {
        if (s.charAt(sa + p) != s.charAt(sb + p)) return false
        p += 1
      }
      true
    }
    var d = 0
    var k = 0
    while (k < nBg) {
      var slot = bigramHash(k) & mask
      var done = false
      while (!done) {
        val v = table(slot)
        if (v == 0) { table(slot) = k + 1; d += 1; done = true }
        else if (spanEq(v - 1, k) && spanEq(v, k + 1)) done = true // dup
        else slot = (slot + 1) & mask
      }
      k += 1
    }
    d
  }
}
