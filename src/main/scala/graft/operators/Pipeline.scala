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
                  minQuality: Double = 0.5, tau: Double = 0.8): DataFrame =
    cleanSurvivors(spark, dir, minQuality, tau).orderBy(col("doc_id"))

  /** The three-stage survivor frame (doc_id, n_tokens, quality_score),
    * unordered — shared by [[corpusClean]] and [[corpusTrain]] (and
    * Profile's DECOMP=train stage ladder). */
  private[graft] def cleanSurvivors(spark: SparkSession, dir: String,
                                    minQuality: Double = 0.5,
                                    tau: Double = 0.8): DataFrame = {
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
  }

  /** `pipeline_corpus_train`: the corpus a training run actually
    * tokenizes — [[corpusClean]]'s three stages COMPOSED with span-level
    * dedup applied to the survivors:
    *
    *   quality gate → exact keeper → near-dup removal →
    *   repeated-span cut ([[Dedup.substringSpansFrom]] over the
    *   SURVIVOR corpus + the CutSpans materialization)
    *
    * Spans are detected over the documents that actually remain, not
    * the raw corpus: a window repeated only between removed duplicates
    * is already gone with them (Lee et al. dedup the kept set), so the
    * cut list is exactly the residual cross-document repetition
    * doc-level dedup cannot reach. Output: the CLEANED text itself plus
    * post-cut token stats and the quality score — hash-gated end to end
    * by a DuckDB oracle that recomputes all four stages from scratch.
    *
    * Scale shape: corpusClean's one stats/hash/shingle scan, plus ONE
    * survivor-restricted text scan shared by the window pass and the
    * cut (semi join on survivor ids, cached as the compact survivor
    * projection); the span machinery itself shuffles 8-byte window
    * hashes, never text, and every join is hint-pinned shuffle-hash.
    */
  def corpusTrain(spark: SparkSession, dir: String,
                  minQuality: Double = 0.5, tau: Double = 0.8,
                  w: Int = 16): DataFrame = {
    val survivors = cleanSurvivors(spark, dir, minQuality, tau)
      .transform(graft.Caches.scoped(_)) // semi-join prune + quality output
    // CACHED survivor text, by measurement: the A/B at sf10 (1M docs)
    // reads cache 18.25 s vs recompute 21.76 s — the second scan +
    // semi join costs more than the persist. The scale trade is
    // acceptable because MEMORY_AND_DISK degrades to a disk-backed
    // temp copy whose write+read ≈ the re-scan it replaces (never
    // catastrophically worse, unlike a broadcast), while saving the
    // duplicated semi join; a deployment that cannot afford local
    // spill space for its survivor set materializes it to the output
    // store anyway (clean_text IS the product).
    val docs = graft.sources.Tables.documents(spark, dir)
      .join(survivors.select(col("doc_id")).hint("shuffle_hash"),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
      .transform(graft.Caches.scoped(_)) // window pass + cut, one scan
    val perDoc = Dedup.substringSpansFrom(docs, w)
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("span_start"), col("span_end")))).as("sp"),
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("n_removed"))
    val emptyLongs = array().cast("array<bigint>")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("wd"))
      .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
      .join(survivors.select(col("doc_id"), col("quality_score"))
        .hint("shuffle_hash"), Seq("doc_id"))
      .select(col("doc_id"),
        graft.functions.CutSpans.cut_spans(col("wd"),
          coalesce(transform(col("sp"), _.getField("span_start")), emptyLongs),
          coalesce(transform(col("sp"), _.getField("span_end")), emptyLongs))
          .as("clean_text"),
        (size(col("wd")).cast("long") - coalesce(col("n_removed"), lit(0L)))
          .as("n_tokens_clean"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans_removed"),
        col("quality_score"))
      .orderBy(col("doc_id"))
  }
}
