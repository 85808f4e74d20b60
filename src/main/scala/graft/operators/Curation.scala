package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (SURVEY §2.5
  * extension): PII redaction, deterministic split assignment, and
  * per-language corpus statistics. Like the text-analysis pack, these
  * are shuffle-free map stages (plus one tiny groupBy for the stats) —
  * the shapes that run at 100 TB without a second thought.
  */
object Curation {

  /** Redaction patterns — written to the common subset of Java regex
    * (Spark) and RE2 (DuckDB oracle): character classes and bounded
    * repetition only, no backreferences or lookaround.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"

  /** PII scrub over any (doc_id, text) frame — the reusable core, so
    * the spec can drive it with crafted PII rows (the synthetic corpus
    * itself is PII-free, which only proves the no-op path).
    * IPs are replaced before phones: an IPv4 is digits-and-dots and
    * must not be half-eaten by the looser phone pattern.
    */
  def piiScrubFrom(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]").as("clean_text"))

  /** `text_pii_scrub`: match counts + redacted text per document. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrubFrom(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Deterministic split bucket in [0, 100): three md5 hex chars of the
    * key give 4096 equiprobable states folded mod 100 (bias < 0.1%).
    * Content-addressed assignment is what training pipelines need:
    * stable under reprocessing and corpus growth (a document never
    * migrates between splits), reproducible with no RNG state, and
    * computable as a pure map — unlike rand() (nondeterministic under
    * task retry) or row_number (global sort, and every append reshuffles
    * the assignment).
    */
  private def splitBucket(key: Column): Column = {
    val h = md5(key.cast("string"))
    (ascii(substring(h, 1, 1)) * 65536 +
      ascii(substring(h, 2, 1)) * 256 +
      ascii(substring(h, 3, 1))) % 100
  }

  /** `split_train_test`: 90/5/5 train/val/test assignment keyed on
    * doc_id.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), splitBucket(col("doc_id")).cast("long").as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))

  /** `corpus_stats`: per-predicted-language corpus summary — document
    * and token counts, char volume, high-quality share, mean document
    * length. One scan + one tiny shuffle (≤5 language keys with
    * map-side partials). Every aggregate is an exact integer sum; the
    * only double is one final division, so the DuckDB oracle matches
    * bit-for-bit without decimal-accumulator machinery.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("ts", TextAnalysis.statsCol)
      .select(TextAnalysis.langPred(col("ts")).as("lang_pred"),
        col("ts.n_tokens").cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        when(TextAnalysis.qualityScore(col("ts")) >= 0.5, 1L).otherwise(0L).as("hi_q"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("hi_q")).as("n_high_quality"))
      .withColumn("avg_doc_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("lang_pred"))
  }
}
