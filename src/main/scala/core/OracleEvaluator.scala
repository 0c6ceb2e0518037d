package core

/** Single-threaded, Spark-free evaluator — produces the "reference labels"
  * for the conformance suite (SURVEY.md §6.2). Implements §3.3 directly with
  * plain loops; windowed rules via groupBy(conv_id) + sort by the pinned
  * stable ordering (turn_idx, ts, role) (BASELINE.json:6 "stable (conv_id,
  * turn_idx) window ordering"; role is the determinism tie-break).
  *
  * Shares only the pure scalar functions (TextStats/Scrub/LangId/ByteLM)
  * with the pipeline; composes them independently.
  */
object OracleEvaluator {

  /** Evaluate all rules for a batch of turns; output aligned to input order. */
  def evaluate(turns: Seq[Turn]): Seq[ScoredTurn] = {
    val indexed = turns.zipWithIndex
    val out = new Array[ScoredTurn](turns.length)
    indexed.groupBy(_._1.conv_id).foreach { case (_, group) =>
      val sorted = group.sortBy { case (t, _) =>
        (t.turn_idx, Option(t.ts).map(_.getTime).getOrElse(Long.MinValue),
          Option(t.role).getOrElse(""))
      }
      var prevIdx: Option[Int] = None
      var prevRole: Option[String] = None
      var rn = 1
      sorted.foreach { case (t, origPos) =>
        out(origPos) = scoreOne(t, rn, prevIdx, prevRole)
        prevIdx = Some(t.turn_idx)
        prevRole = Some(t.role)
        rn += 1
      }
    }
    out.toSeq
  }

  /** Per-turn evaluation given window state (rn = 1-based position in the
    * stable conv order, prevIdx/prevRole from the preceding turn). Models
    * are injectable so the mapPartitions-batched pipeline tier can pass
    * broadcast copies (BASELINE.json:6) while sharing THIS logic.
    */
  def scoreOne(t: Turn, rn: Int, prevIdx: Option[Int], prevRole: Option[String],
      langModel: LangIdModel = LangId.model,
      lmModel: ByteLMModel = ByteLM.model): ScoredTurn = {
    import RuleSpec._
    val textN = TextStats.norm(t.text)
    val st = TextStats.stats(textN)
    val cp = st.cp
    val nWords = st.nWords
    val (lang, conf) = langModel.score(textN)
    val ppl = lmModel.perplexity(textN)

    val hits = scala.collection.mutable.ArrayBuffer.empty[String]
    def rule(name: String, pre: Boolean, constraint: => Boolean): Unit =
      if (pre && !constraint) hits += name

    rule("r_null", pre = true, t.text != null)
    rule("r_short", pre = true, cp >= MinCpLen)
    rule("r_long", pre = true, cp <= MaxCpLen)
    rule("r_words", pre = true, nWords >= MinWords && nWords <= MaxWords)
    rule("r_rep", st.nBigrams >= MinBigramsForRep,
      1.0 - st.nBigramsDistinct.toDouble / st.nBigrams.toDouble <= MaxRepRatio)
    rule("r_sym", cp >= MinCpLenForRatio,
      st.symbols.toDouble / cp.toDouble <= MaxSymbolRatio)
    rule("r_digit", cp >= MinCpLenForRatio,
      st.digits.toDouble / cp.toDouble <= MaxDigitRatio)
    rule("r_role", pre = true, t.role != null && Roles.contains(t.role))
    rule("r_tool", t.role == "tool", t.tool != null && t.tool.nonEmpty)
    rule("r_order", pre = true,
      if (rn == 1) t.turn_idx == 0 else prevIdx.exists(_ + 1 == t.turn_idx))
    rule("r_alt", t.role != null && AltRoles.contains(t.role),
      !prevRole.contains(t.role))
    rule("r_lang", cp >= MinCpLenForLang, lang == RequiredLang && conf >= MinLangConf)
    rule("r_ppl", nWords >= MinWordsForPpl, ppl <= MaxPpl)

    val sortedHits = hits.sorted.toSeq
    ScoredTurn(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
      lang, conf, ppl, sortedHits, sortedHits.isEmpty, Scrub(t.text))
  }
}
