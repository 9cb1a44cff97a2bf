package graft.functions

import org.apache.spark.sql.Column

/** Text-analysis functions for the training-data pipeline suite.
  *
  * The Column entry points delegate to the native codegen kernels in
  * [[graft.functions.expr.TextExpressions]] — one public path, the
  * fast one. The plain-Scala `*Impl` functions are the independent
  * reference implementations the parity spec checks the kernels
  * against (wrapped in `udf()` locally by the spec, never here).
  */
object TextAnalysis {

  /** Stopword list shared with the DuckDB oracle (q22_text_quality). */
  val StopWords: Seq[String] = Seq("the", "a", "and", "of", "is", "to", "in")

  /** DuckDB lambda-body fragment `w IN ('the', ...)`. */
  def stopListSql(varName: String): String =
    StopWords.map(w => s"'$w'").mkString(s"$varName IN (", ", ", ")")

  // -- language identification ------------------------------------------
  // Deterministic two-signal heuristic in the Cavnar & Trenkle n-gram
  // profiling tradition: (a) fraction of tokens that are high-frequency
  // function words of each language, plus (b) character-bigram profile
  // hits (distinctive bigrams per language) normalized by text length.
  // Word markers dominate when present; the char-n-gram signal breaks
  // ties and handles run-together/fragmentary text.
  private val WordProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "and", "of", "is", "to", "in", "that", "it", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Set("el", "la", "los", "de", "que", "y", "en", "un", "una", "es"),
    "fr" -> Set("le", "les", "des", "de", "et", "est", "un", "une", "dans", "que"),
    "zh" -> Set.empty // no latin-token markers; never predicted by this heuristic
  )

  private val BigramProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("th", "he", "in", "er", "an", "ng"),
    "de" -> Set("ch", "ei", "en", "ie", "sch".take(2), "tz"),
    "es" -> Set("ll", "os", "as", "ci", "ón".take(2), "qu"),
    "fr" -> Set("ou", "au", "eu", "oi", "ai", "qu"),
    "zh" -> Set.empty)

  final case class LangPred(lang: String, confidence: Double)

  def langIdImpl(text: String): LangPred = {
    if (text == null || text.isEmpty) return LangPred("und", 0.0)
    val tokens = text.split(" ")
    if (tokens.isEmpty) return LangPred("und", 0.0)
    val bigrams = text.sliding(2).toSeq
    val nBigrams = math.max(1, bigrams.length)
    val scores = WordProfiles.keys.toSeq.map { lang =>
      val wordScore = tokens.count(WordProfiles(lang).contains).toDouble / tokens.length
      val bigramScore = bigrams.count(BigramProfiles(lang).contains).toDouble / nBigrams
      (lang, wordScore + 0.5 * bigramScore)
    }.sortBy { case (lang, score) => (-score, lang) }
    val (best, score) = scores.head
    if (score == 0.0) LangPred("und", 0.0) else LangPred(best, math.min(1.0, score))
  }

  def langId(text: Column): Column = expr.TextExpressions.langId(text)

  // -- winnowing fingerprints ------------------------------------------
  // Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
  // Document Fingerprinting" (SIGMOD 2003): k-gram rolling hashes, keep
  // the minimum of each sliding window (rightmost min on ties), dedupe
  // consecutive picks. Guarantees any match of length >= window+k-1 is
  // caught.
  def winnowImpl(text: String, kGram: Int, window: Int): Array[Long] = {
    if (text == null || text.length < kGram) return Array.empty
    val n = text.length - kGram + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = Hashing.hash64(text.substring(i, i + kGram))
      i += 1
    }
    if (n <= window) return Array(hashes.min)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var lastPick = -1
    i = 0
    while (i + window <= n) {
      var minIdx = i
      var j = i + 1
      while (j < i + window) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastPick) { out += hashes(minIdx); lastPick = minIdx }
      i += 1
    }
    out.toArray
  }

  def winnow(text: Column, kGram: Int, window: Int): Column =
    expr.TextExpressions.winnow(text, kGram, window)
}
