package core

import java.util.regex.Pattern

/** Pinned PII/toxicity scrub chain (SURVEY.md §3.3 "Scrub chain").
  * Ordered fold — each step runs on the previous step's output; order
  * matters (CC before PHONE so long digit runs resolve to <CC>).
  * Java regex is the normative engine. Byte-exact oracle↔pipeline equality
  * holds because BOTH call this one function (SURVEY.md §8.2).
  */
object ScrubSpec {
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val SsnRe   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  final val CcRe    = "\\b(?:\\d[ -]?){12,18}\\d\\b"
  final val PhoneRe = "(?<!\\d)\\+?\\d[\\d\\- ()]{6,14}\\d(?!\\d)"
  final val Ipv4Re  = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** Pinned toxicity word list (placeholder tokens; the synthetic generator
    * plants exactly these — FIXTURES.md §B). Case-insensitive. */
  final val ToxWords: Seq[String] = Seq("badword1", "badword2", "slur1", "slur2")
  final val ToxRe = "(?i)\\b(?:" + ToxWords.mkString("|") + ")\\b"

  /** (pattern, replacement) in normative application order. */
  final val Chain: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    SsnRe   -> "<SSN>",
    CcRe    -> "<CC>",
    PhoneRe -> "<PHONE>",
    Ipv4Re  -> "<IP>",
    ToxRe   -> "<TOX>")
}

object Scrub {
  private val compiled: Array[(Pattern, String)] =
    ScrubSpec.Chain.map { case (re, rep) => (Pattern.compile(re), rep) }.toArray

  /** Cheap feasibility gates — skipping a pattern that cannot possibly
    * match is output-identical and saves ~all regex work on clean text:
    * step 0 (email) requires '@'; steps 1-4 (SSN/CC/PHONE/IP) require a
    * digit; step 5 (toxicity) requires 'b'/'B' or 's'/'S' (word list is
    * pinned in ScrubSpec and starts with those letters only).
    */
  private def canMatch(step: Int, s: String): Boolean = step match {
    case 0 => s.indexOf('@') >= 0
    case 1 | 2 | 3 | 4 =>
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c >= '0' && c <= '9') return true
        i += 1
      }
      false
    case _ =>
      // substring gate: ToxRe can only match where a tox WORD appears
      // (case-insensitively) as a substring — \b boundaries only restrict
      // further. regionMatches(true, ...) case-folds at least as loosely
      // as (?i) without UNICODE_CASE, so gate=false genuinely implies the
      // regex cannot match; gate=true still runs the regex (the \b check).
      // The old first-LETTER gate fired on nearly every clean row ('b'/'s'
      // appear in most prose), so the 4-alternation regex scanned ~all
      // text; this gate skips it unless a word itself appears.
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (c < 128 && toxFirstAscii(c)) {
          var w = 0
          while (w < toxWordsArr.length) {
            val tw = toxWordsArr(w)
            if (s.regionMatches(true, i, tw, 0, tw.length)) return true
            w += 1
          }
        }
        i += 1
      }
      false
  }

  /** The pinned toxicity words (ASCII by contract — asserted so the ASCII
    * first-char fast path above stays sound if the list changes). */
  private val toxWordsArr: Array[String] = {
    val ws = ScrubSpec.ToxWords.toArray
    require(ws.forall(_.forall(_ < 128)),
      "Scrub gate assumes ASCII toxicity words")
    ws
  }

  /** ASCII chars (either case) that can start a tox word — derived, so the
    * gate stays correct if ScrubSpec.ToxWords changes. */
  private val toxFirstAscii: Array[Boolean] = {
    val t = new Array[Boolean](128)
    ScrubSpec.ToxWords.foreach { w =>
      t(w.head.toLower.toInt) = true
      t(w.head.toUpper.toInt) = true
    }
    t
  }

  /** Null-safe; null → "" (same normalization as TextStats.norm). */
  def apply(text: String): String = {
    var s = TextStats.norm(text)
    var i = 0
    while (i < compiled.length) {
      if (canMatch(i, s)) {
        val (p, rep) = compiled(i)
        s = p.matcher(s).replaceAll(rep)
      }
      i += 1
    }
    s
  }
}
