package graft.operators

import graft.functions.HashedShingles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composed LLM-training-data use
  * case the operator packs exist for, as one declarative plan:
  *
  *   quality gate → exact-duplicate keeper → near-duplicate removal
  *
  * Survivors emerge with their token counts, ready for tokenization
  * budgeting. Stage semantics are exactly the verified operators'
  * ([[TextAnalysis.quality]], [[Dedup.exact]], [[Dedup.ngramJaccard]]),
  * so the whole pipeline stays DuckDB-oracle-checkable; the joins are
  * left_semi/left_anti on doc_id — no row multiplication anywhere.
  *
  * Scale shape: ONE scan of `documents`. All three stages read a shared
  * persisted projection carrying every text-derived column they need —
  * fused [[graft.functions.TextStats]] counts, the md5 exact-dup hash,
  * and the shingle array — and the raw text is dropped before the
  * persist, so at 100 TB the dominant cost (the text scan) is paid
  * once and the cached intermediate is the compact derived form.
  */
object Pipeline {

  def corpusClean(spark: SparkSession, dir: String,
                  minQuality: Double = 0.5, tau: Double = 0.8): DataFrame = {
    val base = graft.sources.Tables.documents(spark, dir)
      .withColumn("ts", TextAnalysis.statsCol)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        col("ts.n_tokens").cast("long").as("n_tokens"),
        TextAnalysis.qualityScore(col("ts")).as("quality_score"),
        md5(col("text").cast("binary")).as("text_hash"),
        // <3 words ⇒ no 3-shingles ⇒ excluded from near-dup detection
        // (Dedup.tokenized's filter, as a null here)
        when(size(col("w")) >= 3,
          HashedShingles.hashed_shingles(col("w"), 3)).as("sh"))
      .transform(graft.Caches.scoped(_))
    // exact dedup: survivors are each hash group's min-id keeper
    val keepers = base.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // near-dup removal: the higher id of every Jaccard>=tau pair drops
    val nearLosers = Dedup.ngramJaccardFrom(
        base.filter(col("sh").isNotNull).select(col("doc_id"), col("sh")), tau)
      .select(col("doc_b").as("doc_id")).distinct()
    base
      .filter(col("quality_score") >= minQuality)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      .orderBy(col("doc_id"))
  }
}
