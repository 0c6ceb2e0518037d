package core

/** Per-language seed vocabularies. Shared by BOTH the deterministic
  * transcript generator (FIXTURES.md §B: "LCG-sampled words from per-language
  * seed vocabularies") and the langid / byte-LM seed corpora (SURVEY.md §3.3)
  * — langid accuracy on the synthetic corpus holds by construction; no
  * external data is used. Words are ordinary high-frequency words of each
  * language (public knowledge).
  */
object Vocab {
  final val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  final val En: Array[String] = Array(
    "the", "and", "for", "with", "that", "this", "from", "have", "are", "was",
    "you", "not", "but", "can", "will", "would", "should", "about", "which",
    "when", "there", "their", "what", "time", "people", "year", "good", "make",
    "think", "know", "take", "could", "them", "some", "other", "than", "then",
    "into", "only", "look", "also", "after", "work", "first", "well", "even",
    "want", "because", "these", "most", "model", "data", "query", "table",
    "system", "answer", "question", "please", "thanks", "help", "need", "run",
    "code", "result", "error", "check", "value", "number", "write", "read")

  final val De: Array[String] = Array(
    "der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "auch",
    "auf", "für", "aber", "wenn", "wir", "sie", "ich", "haben", "werden",
    "kann", "nach", "über", "noch", "dann", "schon", "mehr", "durch", "beim",
    "gegen", "zwischen", "immer", "jahr", "zeit", "leute", "machen", "wissen",
    "gut", "sehr", "frage", "antwort", "danke", "bitte", "hilfe", "daten",
    "tabelle", "fehler", "wert", "zahl", "schreiben", "lesen", "müssen")

  final val Fr: Array[String] = Array(
    "le", "la", "les", "des", "une", "est", "pas", "que", "qui", "dans",
    "pour", "avec", "sur", "sont", "mais", "nous", "vous", "ils", "elle",
    "être", "avoir", "faire", "plus", "tout", "comme", "aussi", "bien",
    "très", "quand", "alors", "temps", "gens", "année", "bon", "savoir",
    "question", "réponse", "merci", "aide", "données", "tableau", "erreur",
    "valeur", "nombre", "écrire", "lire", "besoin", "parce", "cette", "donc")

  final val Es: Array[String] = Array(
    "el", "la", "los", "las", "una", "que", "con", "por", "para", "como",
    "pero", "más", "este", "esta", "ser", "estar", "hacer", "tener", "poder",
    "decir", "todo", "también", "cuando", "muy", "bien", "tiempo", "gente",
    "año", "bueno", "saber", "pregunta", "respuesta", "gracias", "ayuda",
    "datos", "tabla", "error", "valor", "número", "escribir", "leer",
    "necesito", "porque", "entonces", "ahora", "sobre", "entre", "según")

  final val Zh: Array[String] = Array(
    "的", "是", "不", "了", "在", "人", "有", "我", "他", "这",
    "中", "大", "来", "上", "国", "个", "到", "说", "们", "为",
    "时间", "问题", "回答", "谢谢", "帮助", "数据", "表格", "错误",
    "数值", "数字", "写入", "读取", "需要", "因为", "所以", "现在",
    "可以", "什么", "知道", "没有", "一个", "我们", "你们", "他们")

  final val ByLang: Map[String, Array[String]] =
    Map("en" -> En, "de" -> De, "fr" -> Fr, "es" -> Es, "zh" -> Zh)

  /** Deterministic pseudo-random word sequence for lang — the langid / LM
    * seed corpus (2000 words, fixed seed). Covers word-boundary n-grams.
    */
  def corpus(lang: String, nWords: Int = 2000): String = {
    val ws = ByLang(lang)
    val rng = new Lcg(Lcg.mix(7L, Langs.indexOf(lang).toLong))
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(ws(rng.nextInt(ws.length)))
      i += 1
    }
    sb.toString
  }

  /** Extra LM-only training text so digits/punctuation in ordinary prose
    * don't inflate perplexity (gibberish detection must key on genuinely
    * unseen byte patterns, not on "contains a number").
    */
  final val LmExtra: String = {
    val rng = new Lcg(Lcg.mix(11L, 0L))
    val sb = new StringBuilder
    var i = 0
    while (i < 600) {
      sb.append(rng.nextInt(100000)).append(' ')
      if (i % 7 == 0) sb.append(". , ! ? : ; ( ) - ")
      i += 1
    }
    sb.toString
  }
}
