package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token
  * counting, quality scoring, stopword ratios, and heuristic
  * language ID. Everything is built-in Column expressions / SQL
  * higher-order functions — zero UDFs, so the hot path stays inside
  * Spark's columnar execution at any scale.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Whitespace tokenization (single-space split, matching the
    * corpus's generator).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(Stopwords)))

  /** Characters per token, whitespace excluded. */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / size(tokens(text))

  /** Composite quality score in [0, 1]: half length-saturation
    * (saturates at 50 tokens), half non-stopword density.
    */
  def qualityScore(text: Column): Column = {
    val n = size(tokens(text)).cast("double")
    val stopRatio = stopwordCount(tokens(text)).cast("double") / n
    least(lit(1.0), n / 50.0) * 0.5 + (lit(1.0) - stopRatio) * 0.5
  }

  /** Exact LZ78 phrase count over the first `cap` characters — the
    * compiled graft.functions.LzPhraseCount expression, replacing the
    * interpreted HOF fold with the same delimited-string dictionary
    * semantics the DuckDB oracle replays (bit-equal,
    * CodegenTextOpsSpec; 8× on the q269 bench). The empty guard
    * stays at this level: DuckDB's string_split('', '') yields []
    * where the old fold's split("", "") saw [""] — the oracle counts
    * 0 phrases for an empty document. NULL stays NULL.
    */
  def lzPhraseCount(text: Column, cap: Int): Column =
    when(length(text) === 0, lit(0))
      .otherwise(graft.functions.LzPhraseCount(text, cap))

  /** Language marker words; deterministic, mirrors the SQL oracle. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "les", "du", "et"),
  )

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Heuristic language ID: argmax of marker-word counts with a fixed
    * tie-break order (en > es > de > fr), 'und' when nothing matches.
    * A real deployment swaps the marker lists for character-n-gram
    * profiles; the dataflow (per-row scoring, no shuffle) is identical.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val s = LangMarkers.map { case (lang, m) => lang -> langScore(t, m) }
    val total = s.map(_._2).reduce(_ + _)
    val Seq(en, es, de, fr) = s.map(_._2)
    when(total === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }
}
