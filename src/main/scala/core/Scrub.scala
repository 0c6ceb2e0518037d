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
      var i = 0
      while (i < s.length) {
        if (toxFirst(s.charAt(i))) return true
        i += 1
      }
      false
  }

  /** First letters (both cases) of the pinned toxicity words — derived, so
    * the gate stays correct if ScrubSpec.ToxWords changes. */
  private val toxFirst: Set[Char] =
    ScrubSpec.ToxWords.flatMap(w => Seq(w.head.toLower, w.head.toUpper)).toSet

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
