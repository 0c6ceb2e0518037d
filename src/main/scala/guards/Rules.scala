package guards

import core.{RuleSpec, TextStats}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The declarative rule → `Column` predicate compiler (SURVEY.md §3.2 #11;
  * BASELINE.json:6 "compiled to Column predicates"). A rule is
  * (name, precondition, constraint); it is VIOLATED iff `pre && !constraint`
  * (conditional-rule semantics: precondition ⇒ constraint). All thresholds
  * come from core.RuleSpec — the same constants the oracle reads.
  *
  * Everything here is pure Column algebra over java.util.regex-backed
  * builtins (regexp_count/split run the same regex engine as the oracle's
  * TextStats), so the whole rule path stays inside whole-stage codegen
  * (SURVEY.md §5 O9).
  *
  * Expected input columns: text, role, tool, turn_idx plus window columns
  * `_rn`, `_prev_idx`, `_prev_role` (stable (conv_id, turn_idx, ts, role)
  * order) and scoring columns `lang`, `lang_conf`, `ppl`.
  */
object Rules {
  import RuleSpec._

  final case class GuardRule(name: String, pre: Column, constraint: Column) {
    /** Null-safe violation predicate: null pre ⇒ not applicable; null
      * constraint ⇒ violated (constraint not satisfied). */
    def violated: Column =
      coalesce(pre, lit(false)) && !coalesce(constraint, lit(false))
  }

  /** Normalized text (null → "") — pinned in core.TextStats.norm. */
  def textN(text: Column): Column = coalesce(text, lit(""))

  def cpLen(tn: Column): Column = length(tn)

  /** Lowercased words, empties removed — mirrors TextStats.words. */
  def wordsCol(tn: Column): Column =
    filter(split(lower(tn), TextStats.WordSep), w => length(w) > 0)

  def symbolCount(tn: Column): Column = regexp_count(tn, lit(TextStats.SymbolRe))
  def digitCount(tn: Column): Column = regexp_count(tn, lit(TextStats.DigitRe))

  /** Consecutive word bigrams — mirrors TextStats.bigrams. */
  def bigramsCol(words: Column): Column = {
    val n = size(words)
    when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** The pinned rule set of SURVEY.md §3.3 as Column predicates. */
  def all(
      text: Column, role: Column, tool: Column, turnIdx: Column,
      rn: Column, prevIdx: Column, prevRole: Column,
      lang: Column, langConf: Column, ppl: Column): Seq[GuardRule] = {
    val tn = textN(text)
    val cp = cpLen(tn)
    val ws = wordsCol(tn)
    val nWords = size(ws)
    val bg = bigramsCol(ws)
    val nBg = size(bg)
    val repRatio = lit(1.0) - size(array_distinct(bg)).cast("double") / nBg.cast("double")
    val t = lit(true)

    Seq(
      GuardRule("r_null", t, text.isNotNull),
      GuardRule("r_short", t, cp >= MinCpLen),
      GuardRule("r_long", t, cp <= MaxCpLen),
      GuardRule("r_words", t, nWords >= MinWords && nWords <= MaxWords),
      GuardRule("r_rep", nBg >= MinBigramsForRep, repRatio <= MaxRepRatio),
      GuardRule("r_sym", cp >= MinCpLenForRatio,
        symbolCount(tn).cast("double") / cp.cast("double") <= MaxSymbolRatio),
      GuardRule("r_digit", cp >= MinCpLenForRatio,
        digitCount(tn).cast("double") / cp.cast("double") <= MaxDigitRatio),
      GuardRule("r_role", t, role.isInCollection(RolesSorted)),
      GuardRule("r_tool", role <=> "tool", tool.isNotNull && length(tool) > 0),
      GuardRule("r_order", t,
        when(rn === 1, turnIdx === 0).otherwise(prevIdx + 1 === turnIdx)),
      GuardRule("r_alt", role.isInCollection(AltRoles.toSeq.sorted),
        prevRole.isNull || !(role <=> prevRole)),
      GuardRule("r_lang", cp >= MinCpLenForLang,
        lang === RequiredLang && langConf >= MinLangConf),
      GuardRule("r_ppl", nWords >= MinWordsForPpl, ppl <= MaxPpl))
  }

  /** Lexicographically sorted names of violated rules (SURVEY.md §2.3). */
  def ruleHits(rules: Seq[GuardRule]): Column =
    sort_array(filter(
      array(rules.map(r => when(r.violated, lit(r.name)).otherwise(lit(null))): _*),
      x => x.isNotNull))
}
