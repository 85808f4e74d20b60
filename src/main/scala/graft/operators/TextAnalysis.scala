package graft.operators

import graft.functions.RollingHash
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis pack over the `documents` table (SURVEY §2.5).
  *
  * Everything here is per-row column arithmetic — no shuffle at all
  * except the final presentation ORDER BY, so each operator scales as a
  * pure map stage over the scan. All ratios are single double divisions
  * of exact integer counts (deterministic across engines, SURVEY §4).
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, or single
    * non-alphanumeric marks — the pre-tokenization split most BPE
    * vocabularies assume. Shared with the DuckDB oracle verbatim.
    */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private val words: Column = split(col("text"), " ")

  /** `text_tokens`: whitespace token count, regex (BPE-ish) token
    * count, and mean token length.
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(words).cast("long").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0))).cast("long").as("n_bpe_tokens"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(words).cast("double")).as("avg_token_len"))
      .orderBy(col("doc_id"))

  /** Stopword list used by the quality score (English function words;
    * the synthetic corpus draws from a SQL-ish vocabulary where only
    * 'the' and 'a' occur, which is fine — the *ratio machinery* is what
    * the operator contributes).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** `text_quality`: length/stopword/alpha ratios folded into a [0,1]
    * quality score — the standard cheap pre-filter in front of
    * expensive pipeline stages (dedup, embedding) at 100 TB.
    */
  private[operators] def stopRatioCol: Column = {
    val stopArr = array(Stopwords.map(lit): _*)
    size(filter(words, w => array_contains(stopArr, w))).cast("double") /
      size(words).cast("double")
  }

  private[operators] def alphaRatioCol: Column =
    length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
      length(col("text")).cast("double")

  /** The [0,1] quality score as a reusable column over `text` (also
    * consumed by [[Curation.corpusStats]] and Pipeline).
    */
  private[operators] def qualityScoreCol: Column = {
    val len = length(col("text")).cast("double")
    least(len / 500.0, lit(1.0)) * 0.25 + stopRatioCol * 0.25 + alphaRatioCol * 0.5
  }

  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_measured"),
        size(words).cast("long").as("n_tokens"),
        stopRatioCol.as("stopword_ratio"),
        alphaRatioCol.as("alpha_ratio"),
        qualityScoreCol.as("quality_score"))
      .orderBy(col("doc_id"))

  /** Per-language marker words for the heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** `text_langid`: stopword-marker language heuristic. Prediction is
    * the first language (in [[LangMarkers]] order) achieving the
    * maximal positive marker count; no marker hits → 'und'. The
    * priority chain makes ties deterministic in both engines.
    */
  private[operators] def langScoreCols: Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      lang -> size(filter(words, w => array_contains(arr, w)))
    }

  /** The predicted-language column over `text` (also consumed by
    * [[Curation.corpusStats]]). foldRight builds
    * when(en)...otherwise(when(es)...): first-match priority follows
    * [[LangMarkers]] order, making ties deterministic in both engines.
    */
  private[operators] def langPredCol: Column = {
    val scores = langScoreCols
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), rest) =>
      when(s === best && best > 0, lang).otherwise(rest)
    }
  }

  def langid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id") +:
        langScoreCols.map { case (lang, s) => s.cast("long").as(s"score_$lang") } :+
        langPredCol.as("lang_pred"): _*)
      .orderBy(col("doc_id"))

  /** `text_fingerprint`: winnowing rolling-hash fingerprint via the
    * [[RollingHash]] custom expression (rows-only; verified against an
    * independent reimplementation in TextSpec).
    */
  def fingerprint(spark: SparkSession, dir: String, window: Int = 16): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        RollingHash.rolling_fingerprint(col("text"), window).as("fingerprint"))
      .orderBy(col("doc_id"))
}
