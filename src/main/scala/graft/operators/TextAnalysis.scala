package graft.operators

import graft.functions.{RollingHash, TextStats}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis pack over the `documents` table (SURVEY §2.5).
  *
  * Everything here is per-row column arithmetic — no shuffle at all
  * except the final presentation ORDER BY, so each operator scales as a
  * pure map stage over the scan. All ratios are single double divisions
  * of exact integer counts (deterministic across engines, SURVEY §4).
  *
  * Every counting statistic comes from ONE pass of the codegen'd
  * [[TextStats]] kernel (whole-stage codegen CSE evaluates it once per
  * row however many fields a query reads) — the declarative
  * `size(filter(split(text), λ))` trees it replaced ran interpreted,
  * re-splitting the text ~20× per row across langid + quality +
  * corpus_stats.
  */
object TextAnalysis {

  /** BPE-ish token pattern: letter runs, digit runs, or single
    * non-alphanumeric marks — the pre-tokenization split most BPE
    * vocabularies assume. The DuckDB oracle uses this regex verbatim;
    * [[TextStats]] counts its matches in the fused byte scan.
    */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Stopword list used by the quality score (English function words;
    * the synthetic corpus draws from a SQL-ish vocabulary where only
    * 'the' and 'a' occur, which is fine — the *ratio machinery* is what
    * the operator contributes).
    */
  val Stopwords: Seq[String] = TextStats.Stopwords

  /** Per-language marker words for the heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = TextStats.LangMarkers

  /** The fused per-row statistics struct (see [[TextStats.Schema]]). */
  private[operators] def statsCol: Column = TextStats.text_stats(col("text"))

  /** `text_tokens`: whitespace token count, regex (BPE-ish) token
    * count, and mean token length (non-space chars / tokens).
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ts", statsCol)
      .select(col("doc_id"),
        col("ts.n_tokens").cast("long").as("n_tokens"),
        col("ts.n_bpe").cast("long").as("n_bpe_tokens"),
        ((length(col("text")) - col("ts.n_space")).cast("double") /
          col("ts.n_tokens").cast("double")).as("avg_token_len"))
      .orderBy(col("doc_id"))

  private[operators] def stopRatio(ts: Column): Column =
    ts("n_stop").cast("double") / ts("n_tokens").cast("double")

  private[operators] def alphaRatio(ts: Column): Column =
    ts("n_alpha").cast("double") / length(col("text")).cast("double")

  /** The [0,1] quality score — length/stopword/alpha ratios folded into
    * the standard cheap pre-filter in front of expensive pipeline
    * stages (dedup, embedding) at 100 TB. Also consumed by
    * [[Curation.corpusStats]] and [[Pipeline]].
    */
  private[operators] def qualityScore(ts: Column): Column = {
    val len = length(col("text")).cast("double")
    least(len / 500.0, lit(1.0)) * 0.25 + stopRatio(ts) * 0.25 + alphaRatio(ts) * 0.5
  }

  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ts", statsCol)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_measured"),
        col("ts.n_tokens").cast("long").as("n_tokens"),
        stopRatio(col("ts")).as("stopword_ratio"),
        alphaRatio(col("ts")).as("alpha_ratio"),
        qualityScore(col("ts")).as("quality_score"))
      .orderBy(col("doc_id"))

  /** The predicted-language column over a [[TextStats]] struct.
    * Prediction is the first language (in [[LangMarkers]] order)
    * achieving the maximal positive marker count; no marker hits →
    * 'und'. foldRight builds when(en)...otherwise(when(es)...):
    * first-match priority makes ties deterministic in both engines.
    */
  private[operators] def langPred(ts: Column): Column = {
    val scores = LangMarkers.map { case (lang, _) => lang -> ts(s"s_$lang") }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), rest) =>
      when(s === best && best > 0, lang).otherwise(rest)
    }
  }

  /** `text_langid`: stopword-marker language heuristic. */
  def langid(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ts", statsCol)
      .select(col("doc_id") +:
        LangMarkers.map { case (lang, _) =>
          col(s"ts.s_$lang").cast("long").as(s"score_$lang") } :+
        langPred(col("ts")).as("lang_pred"): _*)
      .orderBy(col("doc_id"))

  /** `text_repetition`: Gopher/RefinedWeb-class repetition signals —
    * top-word fraction and vocabulary richness — per document. The
    * [[graft.functions.WordStats]] kernel computes the whole
    * word-frequency profile in one map-side pass; the declarative form
    * (explode → groupBy(doc, word) → groupBy(doc)) shuffles the entire
    * token stream twice, the single largest avoidable shuffle in a
    * 100 TB curation sweep. Ratios are single double divisions of
    * exact integer counts (engine-deterministic, SURVEY §4).
    */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ws", graft.functions.WordStats.word_stats(col("text")))
      .select(col("doc_id"),
        col("ws.n_words").cast("long").as("n_words"),
        col("ws.n_distinct").cast("long").as("n_distinct_words"),
        col("ws.top_n").cast("long").as("top_word_n"),
        (col("ws.top_n").cast("double") / col("ws.n_words").cast("double"))
          .as("top_word_frac"),
        (col("ws.n_distinct").cast("double") / col("ws.n_words").cast("double"))
          .as("distinct_word_frac"))
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
