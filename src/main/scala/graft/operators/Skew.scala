package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §5: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join split handles join-side skew at runtime (enabled in
  * Sessions); these helpers cover the aggregation-side case AQE does
  * not: a groupBy where one key holds a disproportionate share of rows
  * pins that key's entire partial state onto one reducer. Salting
  * splits each hot key across `buckets` sub-keys for the first
  * aggregation and merges the sub-aggregates in a second, tiny shuffle.
  *
  * Correct only for algebraic aggregates (sum/count/min/max — anything
  * with an associative merge); the caller provides both the per-salt
  * partial and the merge expression per output column.
  *
  * Known limitation: the salt hashes row CONTENT (retry-safe — see
  * below), so a hot key made of byte-identical duplicate rows all
  * lands on one salt and gains nothing. For that shape, dedup-count
  * first (collapse identical rows to (row, n) with a count, then
  * aggregate weighted) or include a distinguishing column.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param df      input
    * @param keys    grouping keys
    * @param buckets salt fan-out (≈ executor count covers the worst key)
    * @param partials per-salt aggregates, e.g. `sum(col("v")).as("v")`
    * @param merges   second-phase merge of the partials, e.g.
    *                 `sum(col("v")).as("v")` — same names in and out
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    // The salt MUST be deterministic per row content: a retried map
    // task re-evaluates the salt, and a nondeterministic one (e.g.
    // monotonically_increasing_id) can re-assign rows whose original
    // salt's partial was already consumed — double-counting or losing
    // them (the classic shuffle-replay hazard). Hashing the row is
    // retry-stable; fully identical duplicate rows share a salt, which
    // only matters if the hot key consists of byte-identical rows.
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(buckets)))
    // Phase 1: (keys, salt) — the hot key's rows spread over `buckets`
    // reducers, each holding only a partial.
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    // Phase 2: merge the ≤ buckets partials per key — input is
    // O(distinct keys × buckets), no longer row-skewed.
    partial
      .groupBy(keys: _*)
      .agg(merges.head, merges.tail: _*)
  }
}
