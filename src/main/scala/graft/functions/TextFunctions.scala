package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data pipeline.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage-compatible) — no UDFs, so filters around
  * these still push down and the expressions stay in Tungsten.
  *
  * Semantics mirror the reference's silver transform
  * (reference: airflow/dags/etl.py:150-196): strip non-word chars →
  * lowercase → collapse whitespace → trim.
  */
object TextFunctions {

  /** Chars the reference keeps: word chars, digits, whitespace and
    * basic punctuation (reference: airflow/dags/etl.py:158-170). */
  val StripPattern: String = "[^\\w\\d\\s.,!?;:\\-()]"

  /** Reference-order normalization: strip → lower → collapse ws → trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(regexp_replace(c, StripPattern, " ")), "\\s+", " "))

  /** Whitespace tokens, empties dropped (split of "" yields [""]). */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > lit(0))

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** A BPE-ish regex tokenizer: word runs or single non-word marks —
    * the usual pre-tokenization split for byte-pair encoders.
    * (Match-extraction, not split: lookarounds don't exist in RE2.) */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c)).cast("long")

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "as", "at", "by", "it")

  /** Fraction of tokens that are stopwords, 4dp. Null-safe: 0.0 for
    * token-less docs. */
  def stopwordRatio(toks: Column): Column = {
    val n = size(toks)
    val sw = size(filter(toks, t => t.isin(Stopwords: _*)))
    round(when(n > 0, sw.cast("double") / n.cast("double")).otherwise(lit(0.0)), 4)
  }

  /** Fraction of characters that are sentence punctuation, 4dp. */
  def punctRatio(c: Column): Column = {
    val total = length(c)
    val nonPunct = length(regexp_replace(c, "[.,!?;:]", ""))
    round(when(total > 0, (total - nonPunct).cast("double") / total.cast("double"))
      .otherwise(lit(0.0)), 4)
  }

  /** Composite quality score in [0,1]: length band + stopword presence
    * − punctuation excess. A cheap heuristic in the Gopher/C4 style:
    * real prose has moderate stopword density and few symbol runs. */
  def qualityScore(c: Column): Column = {
    val toks = tokens(c)
    val n = size(toks).cast("double")
    val lenScore = when(n >= 20 && n <= 1000, lit(0.5))
      .when(n >= 5, lit(0.25)).otherwise(lit(0.0))
    val swRatio = when(size(toks) > 0,
      size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / n)
      .otherwise(lit(0.0))
    val swScore = when(swRatio > 0.01 && swRatio < 0.6, lit(0.3)).otherwise(lit(0.0))
    val punct = (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("double")
    val punctPenalty = when(length(c) > 0 && punct / length(c).cast("double") > 0.2, lit(0.2))
      .otherwise(lit(0.0))
    round(lit(0.2) + lenScore + swScore - punctPenalty, 4)
  }

  /** Marker words per language for the n-gram/marker-vote language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "is", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "que", "es", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "pour"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3"))

  def langVote(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*))).cast("long")

  /** Predicted language: argmax of marker votes with fixed precedence
    * (declaration order); "und" when no marker hits at all. */
  def langId(c: Column): Column = {
    val toks = tokens(lower(c))
    val votes = LangMarkers.map { case (lang, ms) => lang -> langVote(toks, ms) }
    val top = greatest(votes.map(_._2): _*)
    votes.foldLeft(when(top === 0, lit("und"))) { case (acc, (lang, v)) =>
      acc.when(v === top, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Order-independent bag fingerprint: md5 over the sorted distinct
    * token set. Two docs with the same token bag collide — the cheap
    * "same doc re-scraped with different whitespace" detector. */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** PII patterns (RE2-compatible — no lookarounds — so the DuckDB
    * oracle replays them verbatim). */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?[0-9][0-9() .-]{7,}[0-9]"

  /** Redact emails then phone numbers. Map-only; the codegen'd
    * regexp_replace keeps this in whole-stage codegen. */
  def piiScrub(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def piiEmailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0))).cast("long")

  def piiPhoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhonePattern), lit(0))).cast("long")

  /** Word n-gram shingles over a token array; empty when |toks| < n. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
