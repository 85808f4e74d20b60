package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composed LLM-training-data use
  * case the operator packs exist for, as one declarative plan:
  *
  *   quality gate → exact-duplicate keeper → near-duplicate removal
  *
  * Survivors emerge with their token counts, ready for tokenization
  * budgeting. Every stage is one of the verified operators
  * ([[TextAnalysis.quality]], [[Dedup.exact]], [[Dedup.ngramJaccard]]),
  * so the whole pipeline stays DuckDB-oracle-checkable; the joins are
  * left_semi/left_anti on doc_id — no row multiplication anywhere.
  */
object Pipeline {

  def corpusClean(spark: SparkSession, dir: String,
                  minQuality: Double = 0.5, tau: Double = 0.8): DataFrame = {
    val quality = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    // exact dedup: survivors are each hash group's min-id keeper
    val keepers = Dedup.exact(spark, dir).select(col("keep_id").as("doc_id"))
    // near-dup removal: the higher id of every Jaccard>=tau pair drops
    val nearLosers = Dedup.ngramJaccard(spark, dir, tau)
      .select(col("doc_b").as("doc_id")).distinct()
    quality
      .filter(col("quality_score") >= minQuality)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(nearLosers, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }
}
