package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * Every function is either built-in-composed or a native codegen'd
  * expression (language ID and the rolling fingerprint live in
  * [[graft.functions.TextExpressions]]) — zero ScalaUDFs on any path.
  */
object Text {

  /** Whitespace tokenization — the baseline token counter. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: word count + extra units for long
    * words (≈ 4 chars/token heuristic), no external vocab needed.
    */
  def approxBpeCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + greatest(ceil(length(w) / 4.0), lit(1L)).cast("long"))

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "for", "on")

  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(filter(ts, w => w.isin(Stopwords: _*))).cast("double") / size(ts))
  }

  def meanWordLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(aggregate(ts, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ts))
  }

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        length(text))

  /** Composite quality score in [0,1]: length window, stopword presence,
    * reasonable word lengths, low punctuation; majority-punctuation text is
    * zeroed outright. A deterministic, explainable heuristic in the
    * C4/Gopher-rules tradition.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lenOk = when(n.between(5, 5000), lit(0.4)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text).between(0.01, 0.6), lit(0.3)).otherwise(lit(0.0))
    val wordOk = when(meanWordLen(text).between(2.0, 12.0), lit(0.2)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(0.1)).otherwise(lit(0.0))
    when(punctRatio(text) > 0.5, lit(0.0))
      .otherwise(lenOk + stopOk + wordOk + punctOk)
  }

  /** Canonical-form document fingerprint: md5 of the lowercased,
    * punctuation-collapsed text. The exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Rolling (polynomial) hash fingerprint of word k-grams, winnowed to the
    * minimum — robust to small edits at the document edges. Deterministic
    * and exactly oracled in SQL (HUGEINT mod-2^64 emulation of the
    * wraparound poly hash). A native codegen'd expression
    * ([[graft.functions.RollingFingerprint]]) — no ScalaUDF plan break.
    */
  def rollingFingerprint(text: Column, k: Int): Column =
    graft.functions.TextFunctions.rollingFingerprint(text, k)

  /** Marker-word language ID over {en, de, es, fr, zh}: scores each
    * language by its function-word hits (+ CJK codepoint detection for zh);
    * deterministic tie-break by language code. A standard n-gram/profile
    * heuristic scoped to the five labels in the synthetic corpus.
    */
  val Markers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "you", "that", "it", "for", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "mit", "zu"),
    "es" -> Set("el", "la", "de", "que", "y", "los", "es", "un", "una", "por"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "je", "pas", "pour"),
    "zh" -> Set())

  /** Language ID as a native codegen'd expression
    * ([[graft.functions.LangId]]; scoring lives in
    * [[graft.functions.TextKernel.langId]]).
    */
  def langId(text: Column): Column = graft.functions.TextFunctions.langId(text)
}
