package core

import java.sql.Timestamp

/** Deterministic in-memory transcript generator (FIXTURES.md §B — normative).
  * Master seed 42; each conversation's stream is seeded `Lcg.mix(42, ordinal)`
  * so generation is order- and partition-independent: the Spark source
  * (`spark.range(nConv).flatMap(genConv)`) and the oracle see byte-identical
  * turns regardless of partitioning. No wall-clock, no external data.
  *
  * Plants (suite (a), SURVEY.md §6.3): per-turn violations with p≈2%,
  * mutually exclusive; PII/toxicity with p≈3% on clean en turns; order/alt
  * violations only at a conversation's LAST turn (so one plant ⇒ one
  * violating row). Each plant is engineered to fire its target rule and
  * avoid tripping unrelated preconditions where possible (see per-plant
  * comments); the conformance assertion is `planted ∈ rule_hits` and
  * `clean en turn ⇒ rule_hits = ∅`.
  */
object SynthGen {
  final val MasterSeed = 42L
  final val BaseEpochMs = 1735689600000L // 2025-01-01T00:00:00Z
  final val ZipfAlpha = 1.2
  final val MaxConvTurns = 400
  /** Mean turns/conv under Zipf(1.2) clamped [1,400] ≈ 34 (used to size nConv). */
  final val MeanTurns = 34

  private val GibberishAlphabet =
    "жфщшчъыэюяђљњћџѓѕјΨΛΩθγδβζηξφχσmicro".toCharArray.filter(_ > 'z')

  /** Zipf(α) CDF over k = 1..MaxConvTurns. */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(MaxConvTurns)(i => math.pow((i + 1).toDouble, -ZipfAlpha))
    val total = w.sum
    val cdf = new Array[Double](MaxConvTurns)
    var acc = 0.0
    var i = 0
    while (i < MaxConvTurns) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  def nConversations(totalTurnsTarget: Long): Long =
    math.max(4L, totalTurnsTarget / MeanTurns)

  /** Planted mega-conversation size (skew path, BASELINE.json:6). */
  def megaTurns(totalTurnsTarget: Long): Int =
    math.max(8, (50000L / math.max(1L, 2000000L / math.max(1L, totalTurnsTarget))).toInt)

  private def zipfTurns(rng: Lcg): Int = {
    val u = rng.nextDouble()
    val i = java.util.Arrays.binarySearch(zipfCdf, u)
    val k = if (i >= 0) i + 1 else -i // insertion point + 1
    math.min(MaxConvTurns, math.max(1, k))
  }

  private def sampleWords(rng: Lcg, vocab: Array[String], n: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(rng.nextInt(vocab.length)))
      i += 1
    }
    sb.toString
  }

  /** Words until the code-point count exceeds `minCp`. */
  private def sampleWordsMinCp(rng: Lcg, vocab: Array[String], minCp: Int): String = {
    val sb = new StringBuilder
    var cp = 0
    while (cp <= minCp) {
      if (sb.nonEmpty) { sb.append(' '); cp += 1 }
      val w = vocab(rng.nextInt(vocab.length))
      sb.append(w)
      cp += w.codePointCount(0, w.length)
    }
    sb.toString
  }

  private def gibberish(rng: Lcg): String = {
    // six 2-char letter-only words: wordCount=6 (≥5 ⇒ r_ppl applies) but
    // cpLen=17 (<20 ⇒ r_lang precondition NOT met); chars absent from the
    // LM corpus ⇒ unigram-backoff perplexity ≫ 1000.
    (0 until 6).map { _ =>
      new String(Array(
        GibberishAlphabet(rng.nextInt(GibberishAlphabet.length)),
        GibberishAlphabet(rng.nextInt(GibberishAlphabet.length))))
    }.mkString(" ")
  }

  private def twoLetterWords(rng: Lcg, n: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(('a' + rng.nextInt(26)).toChar).append(('a' + rng.nextInt(26)).toChar)
      i += 1
    }
    sb.toString
  }

  final val ToolNames: Array[String] = Array("search", "code", "browse")

  private val PiiStrings = Array(
    "alice.b@example.com",
    "+1 415-555-0133",
    "123-45-6789",
    "4111 1111 1111 1111",
    "203.0.113.42",
    "badword1")

  /** Per-turn plantable rules (order/alt handled at conv level). */
  private val TurnPlants = Array(
    "r_null", "r_short", "r_long", "r_words", "r_rep", "r_sym", "r_digit",
    "r_role", "r_tool", "r_lang", "r_ppl")

  private def pickLang(rng: Lcg): String = {
    val u = rng.nextDouble()
    if (u < 0.80) "en"
    else if (u < 0.85) "de"
    else if (u < 0.90) "fr"
    else if (u < 0.95) "es"
    else "zh"
  }

  /** Turn count of a conversation WITHOUT materializing it (mirrors the
    * draw order of genConv: lang pick, then size). Used for size-aware
    * work assignment in the scaling harness.
    */
  def convTurns(ordinal: Long, totalTurnsTarget: Long): Int = {
    if (ordinal == 0L) megaTurns(totalTurnsTarget)
    else {
      val rng = new Lcg(Lcg.mix(MasterSeed, ordinal))
      pickLang(rng) // consume the same draws as genConv
      zipfTurns(rng)
    }
  }

  /** Generate one self-contained conversation. Deterministic in (ordinal,
    * totalTurnsTarget) only.
    */
  def genConv(ordinal: Long, totalTurnsTarget: Long): Seq[GenTurn] = {
    val rng = new Lcg(Lcg.mix(MasterSeed, ordinal))
    val convId = f"c$ordinal%08d"
    val lang = if (ordinal == 0L) "en" else pickLang(rng)
    val vocab = Vocab.ByLang(lang)
    val n =
      if (ordinal == 0L) megaTurns(totalTurnsTarget) // planted mega-conversation
      else zipfTurns(rng)

    // conv-level plant at the LAST turn: r_order or r_alt (p = 5%)
    val convPlantU = rng.nextDouble()
    val convPlant =
      if (n >= 2 && convPlantU < 0.025) "r_order"
      else if (n >= 3 && convPlantU < 0.05) "r_alt"
      else ""

    // role script: optional leading system; then user/assistant alternation
    // with p=0.2 tool turns after assistant
    val roles = new Array[String](n)
    var i = 0
    var nextIsUser = true
    if (rng.nextDouble() < 0.3 && n > 1) { roles(0) = "system"; i = 1 }
    while (i < n) {
      if (nextIsUser) { roles(i) = "user"; nextIsUser = false; i += 1 }
      else {
        roles(i) = "assistant"; nextIsUser = true; i += 1
        if (i < n && rng.nextDouble() < 0.2) { roles(i) = "tool"; i += 1 }
      }
    }

    var ts = BaseEpochMs + (ordinal % 365L) * 86400000L + rng.nextInt(86400) * 1000L
    val out = new Array[GenTurn](n)
    // EMITTED role of the previous turn (differs from roles(i-1) when that
    // turn drew a role-mutating plant) — r_alt must duplicate what was
    // actually emitted or the plant never fires
    var prevOutRole: String = null
    i = 0
    while (i < n) {
      ts += (30 + rng.nextInt(271)) * 1000L
      val role = roles(i)
      val isLast = i == n - 1
      // draw the plant decision for every turn from the SAME stream so the
      // sequence stays deterministic regardless of plant outcomes
      val u = rng.nextDouble()
      val plantIdx = rng.nextInt(TurnPlants.length)
      val piiIdx = rng.nextInt(PiiStrings.length)

      var text: String = null
      var tool: String =
        if (role == "tool") SynthGen.ToolNames(rng.nextInt(SynthGen.ToolNames.length))
        else null
      var turnIdx = i
      var outRole = role
      var planted = ""

      val baseWords = 5 + rng.nextInt(116)
      def cleanText(): String = sampleWords(rng, vocab, baseWords)

      if (isLast && convPlant.nonEmpty) {
        planted = convPlant
        text = cleanText()
        if (convPlant == "r_order") turnIdx = i + 3 // idx gap at the tail
        else { // r_alt: duplicate the previous EMITTED user/assistant role
          if (prevOutRole == "user" || prevOutRole == "assistant") {
            outRole = prevOutRole; tool = null
          } else { // previous emitted tool/system/narrator — order gap instead
            planted = "r_order"; turnIdx = i + 3
          }
        }
      } else if (u < 0.02) {
        planted = TurnPlants(plantIdx)
        planted match {
          case "r_null"  => text = null
          case "r_short" => text = "x"
          case "r_long"  => text = sampleWordsMinCp(rng, Vocab.En, RuleSpec.MaxCpLen + 20)
          case "r_words" => text = twoLetterWords(rng, RuleSpec.MaxWords + 100)
          case "r_rep" =>
            val a = Vocab.En(rng.nextInt(Vocab.En.length))
            var b = Vocab.En(rng.nextInt(Vocab.En.length))
            if (b == a) b = if (a == "the") "data" else "the"
            text = Array.fill(20)(a + " " + b).mkString(" ")
          case "r_sym"   => text = "ok >>> ### $$$ !!!"
          case "r_digit" => text = "n 8472 9365 1047"
          case "r_role"  => outRole = "narrator"; text = cleanText(); tool = null
          case "r_tool"  => outRole = "tool"; tool = null; text = cleanText()
          case "r_lang"  => text = sampleWordsMinCp(rng, Vocab.De, RuleSpec.MinCpLenForLang + 10)
          case "r_ppl"   => text = gibberish(rng)
        }
      } else if (u < 0.05 && lang == "en") {
        planted = "pii"
        text = sampleWords(rng, vocab, math.max(10, baseWords)) + " " + PiiStrings(piiIdx)
      } else {
        text = cleanText()
      }

      out(i) = GenTurn(convId, turnIdx, outRole, text, tool, new Timestamp(ts), planted)
      prevOutRole = outRole
      i += 1
    }
    out.toSeq
  }

  /** Convenience: fully materialized corpus (tests/oracle only — small n). */
  def corpus(totalTurnsTarget: Long): Seq[GenTurn] =
    (0L until nConversations(totalTurnsTarget)).flatMap(genConv(_, totalTurnsTarget))
}

/** The synth generator's partition function as a NAMED class (not an
  * anonymous lambda) so consumers can recognize generator-sourced plans
  * structurally: `QualityPipeline.score` checks for this exact class in
  * the MapPartitions node to prove its input is conversation-clustered
  * (one range ordinal expands to one whole conversation with a unique
  * conv_id — `genConv`'s f"c$ordinal%08d" — so conversations are complete
  * and contiguous within every partition by construction) and take the
  * zero-shuffle scoring path.
  */
final class GenConvFlat(totalTurnsTarget: Long)
    extends (Iterator[java.lang.Long] => Iterator[GenTurn]) with Serializable {
  def apply(it: Iterator[java.lang.Long]): Iterator[GenTurn] =
    it.flatMap(ord => SynthGen.genConv(ord, totalTurnsTarget))
}
