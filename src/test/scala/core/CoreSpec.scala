package core

import org.scalatest.funsuite.AnyFunSuite

/** Pure-core conformance: generator plants fire their rules (suite (a) of
  * SURVEY.md §6.3), clean turns stay clean, scrub behaves and is idempotent.
  * No Spark here — this is the oracle side of the story.
  */
class CoreSpec extends AnyFunSuite {

  private lazy val gens = SynthGen.corpus(5000)
  private lazy val scored = OracleEvaluator.evaluate(gens.map(_.toTurn))
  private lazy val byPos = gens.zip(scored)

  test("generator produces a mega-conversation and plants of every kind") {
    val megaSize = gens.count(_.conv_id == "c00000000")
    assert(megaSize == SynthGen.megaTurns(5000))
    val plantedRules = gens.map(_.planted).filter(p => p.nonEmpty && p != "pii").toSet
    // every per-turn plantable rule appears at 5k-turn scale
    assert(plantedRules.contains("r_short"))
    assert(plantedRules.contains("r_lang"))
    assert(plantedRules.contains("r_ppl"))
    assert(plantedRules.size >= 10, s"only planted: $plantedRules")
  }

  test("conditional-rule satisfaction: every planted violation fires its rule") {
    val misses = byPos.filter { case (g, s) =>
      g.planted.nonEmpty && g.planted != "pii" && !s.rule_hits.contains(g.planted)
    }
    assert(misses.isEmpty, misses.take(5).map { case (g, s) =>
      s"${g.conv_id}/${g.turn_idx} planted=${g.planted} hits=${s.rule_hits} text=${Option(g.text).map(_.take(60))}"
    }.mkString("\n"))
  }

  test("clean turns: no rule fires except r_lang on non-English conversations") {
    val clean = byPos.filter(_._1.planted.isEmpty)
    val bad = clean.filter { case (_, s) =>
      s.rule_hits.nonEmpty && s.rule_hits != Seq("r_lang")
    }
    assert(bad.isEmpty, bad.take(5).map { case (g, s) =>
      s"${g.conv_id}/${g.turn_idx} hits=${s.rule_hits} text=${Option(g.text).map(_.take(80))}"
    }.mkString("\n"))
    // and most clean turns are kept outright (en-dominant corpus)
    val keptFrac = clean.count(_._2.keep).toDouble / clean.size
    assert(keptFrac > 0.6, s"kept fraction $keptFrac")
  }

  test("planted PII is scrubbed; clean text is untouched; scrub is idempotent") {
    val pii = byPos.filter(_._1.planted == "pii")
    assert(pii.nonEmpty)
    pii.foreach { case (g, s) =>
      assert(s.scrubbed_text != g.text, s"not scrubbed: ${g.text.takeRight(40)}")
      assert(Scrub(s.scrubbed_text) == s.scrubbed_text, "scrub not idempotent")
    }
    byPos.filter(_._1.planted.isEmpty).take(500).foreach { case (g, s) =>
      assert(s.scrubbed_text == g.text)
    }
  }

  test("scrub chain: pinned replacements and ordering") {
    assert(Scrub("mail alice.b@example.com now") == "mail <EMAIL> now")
    assert(Scrub("ssn 123-45-6789 ok") == "ssn <SSN> ok")
    assert(Scrub("cc 4111 1111 1111 1111 ok") == "cc <CC> ok")
    assert(Scrub("call +1 415-555-0133 ok") == "call <PHONE> ok")
    assert(Scrub("ip 203.0.113.42 ok") == "ip <IP> ok")
    assert(Scrub("you BADWORD1 person") == "you <TOX> person")
    assert(Scrub(null) == "")
  }

  test("langid: correct on every language's own corpus text") {
    for (lang <- Vocab.Langs) {
      val rng = new Lcg(Lcg.mix(99L, lang.length.toLong))
      val text = (0 until 30).map(_ => Vocab.ByLang(lang)(rng.nextInt(Vocab.ByLang(lang).length))).mkString(" ")
      val (pred, conf) = LangId.model.score(text)
      assert(pred == lang, s"$lang predicted as $pred (conf $conf)")
      assert(conf > 0.65, s"$lang conf $conf")
    }
    assert(LangId.model.score("")._1 == "und")
    assert(LangId.model.score(null)._1 == "und")
  }

  test("perplexity: low on corpus text, high on gibberish") {
    val en = "the data table and the query will run with good result"
    assert(ByteLM.model.perplexity(en) < 100.0, s"en ppl ${ByteLM.model.perplexity(en)}")
    val gib = "жф ыэ юя ђљ ћџ ѕј"
    assert(ByteLM.model.perplexity(gib) > RuleSpec.MaxPpl,
      s"gibberish ppl ${ByteLM.model.perplexity(gib)}")
    assert(ByteLM.model.perplexity("") == 0.0)
    assert(ByteLM.model.perplexity(null) == 0.0)
  }

  test("text stats: pinned edge-case semantics") {
    assert(TextStats.cpLen(null) == 0)
    assert(TextStats.cpLen("héllo") == 5)
    assert(TextStats.cpLen("😀") == 1) // one astral code point
    assert(TextStats.words("Hello, WORLD!  42").toSeq == Seq("hello", "world", "42"))
    assert(TextStats.repRatio("a b a b a b") == 1.0 - 2.0 / 5.0)
    assert(TextStats.symbolCount("ab, c!?") == 3)
    assert(TextStats.digitRatio("1234567890") == 1.0)
  }

  test("windowed rules: order/alternation edge cases") {
    import java.sql.Timestamp
    def t(conv: String, idx: Int, role: String, tsMs: Long) =
      Turn(conv, idx, role, "the data table and the query will run fine now ok", null, new Timestamp(tsMs))
    // nonzero start
    val s1 = OracleEvaluator.evaluate(Seq(t("a", 1, "user", 1000)))
    assert(s1.head.rule_hits == Seq("r_order"))
    // gap
    val s2 = OracleEvaluator.evaluate(Seq(t("a", 0, "user", 1000), t("a", 2, "assistant", 2000)))
    assert(s2(1).rule_hits == Seq("r_order"))
    // duplicate idx -> r_order on the second by stable (idx, ts) order
    val s3 = OracleEvaluator.evaluate(Seq(t("a", 0, "user", 1000), t("a", 0, "assistant", 2000)))
    assert(s3(1).rule_hits == Seq("r_order"))
    // alternation violation
    val s4 = OracleEvaluator.evaluate(Seq(t("a", 0, "user", 1000), t("a", 1, "user", 2000)))
    assert(s4(1).rule_hits == Seq("r_alt"))
    // tool between user turns breaks the lag -> no r_alt
    val s5 = OracleEvaluator.evaluate(Seq(
      t("a", 0, "user", 1000),
      Turn("a", 1, "tool", "output ok", "search", new Timestamp(3000)),
      t("a", 2, "user", 4000)))
    assert(s5.forall(_.rule_hits.isEmpty), s5.map(_.rule_hits).toString)
    // out-of-order input rows are re-sorted by the stable window
    val s6 = OracleEvaluator.evaluate(Seq(t("a", 1, "assistant", 2000), t("a", 0, "user", 1000)))
    assert(s6.forall(_.rule_hits.isEmpty))
  }

  test("generator determinism: same ordinal twice is byte-identical") {
    val a = SynthGen.genConv(17L, 5000)
    val b = SynthGen.genConv(17L, 5000)
    assert(a == b)
  }
}
