package core

/** Single source of truth for every rule threshold and rule name
  * (SURVEY.md §3.3, §8.2). Both `core.OracleEvaluator` and the Spark rule
  * compiler (`guards.Rules`) read ONLY these constants.
  */
object RuleSpec {
  // r_short / r_long: code-point length bounds
  final val MinCpLen = 2
  final val MaxCpLen = 8000
  // r_words: word-count bounds
  final val MinWords = 1
  final val MaxWords = 2000
  // r_rep: applies when bigram count >= MinBigramsForRep; violated when
  // repetition ratio > MaxRepRatio
  final val MinBigramsForRep = 8
  final val MaxRepRatio = 0.5
  // r_sym / r_digit: apply when cpLen >= MinCpLenForRatio
  final val MinCpLenForRatio = 10
  final val MaxSymbolRatio = 0.30
  final val MaxDigitRatio = 0.50
  // r_role: allowed role domain
  final val Roles: Set[String] = Set("system", "user", "assistant", "tool")
  final val RolesSorted: Seq[String] = Roles.toSeq.sorted
  // r_alt: alternation applies to these roles
  final val AltRoles: Set[String] = Set("user", "assistant")
  // r_lang: applies when cpLen >= MinCpLenForLang
  final val MinCpLenForLang = 20
  final val RequiredLang = "en"
  final val MinLangConf = 0.65
  // r_ppl: applies when wordCount >= MinWordsForPpl
  final val MinWordsForPpl = 5
  final val MaxPpl = 1000.0

  /** All rule names, lexicographic order (rule_hits is sorted). */
  final val AllRules: Seq[String] = Seq(
    "r_alt", "r_digit", "r_lang", "r_long", "r_null", "r_order", "r_ppl",
    "r_rep", "r_role", "r_short", "r_sym", "r_tool", "r_words")
}
