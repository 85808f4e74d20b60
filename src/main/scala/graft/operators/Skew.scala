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
    require(!df.columns.contains("__salt"),
      "input already has a '__salt' column — rename it before calling saltedAgg")
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

  /** Salted replicate join — the join-side analogue of [[saltedAgg]]
    * for the many-to-ONE posting shape (a fact stream joining a
    * dimension keyed uniquely on the join key, where the key
    * distribution is Zipfian and the dimension is too large to
    * broadcast): the fact side gets a content-hash salt in
    * [0, fanout), the dimension side is replicated once per salt
    * value, and the join runs on (key, salt) — so a hot key's fact
    * rows spread across `fanout` reducers instead of pinning one.
    *
    * Cost model: the dimension shuffles fanout× (it is the SMALL side
    * by assumption — one row per key), the fact side shuffles once
    * (which a non-broadcast join pays anyway), and no reducer holds
    * more than ~|hotkey|/fanout of any key. This is the standard
    * replicate-fragment skew join; AQE's skew-split covers the same
    * hazard for sort-merge joins at runtime, but a hint-pinned
    * shuffle-hash join (the right strategy for fixed-width posting
    * rows) is outside AQE's skew handling — salting is the structural
    * fix.
    *
    * Requirements: `right` has AT MOST ONE row per key (a dimension) —
    * many-to-many would multiply pairs across salts; the join is inner
    * or left (each left row meets exactly its key's replica in its own
    * salt bucket). The salt hashes the full left row content, so it is
    * retry-stable (same argument as [[saltedAgg]]); byte-identical
    * left rows share a salt, which only matters if a hot KEY consists
    * of identical full rows.
    */
  def saltedReplicateJoin(left: DataFrame, right: DataFrame, key: String,
                          fanout: Int = 32, joinType: String = "inner"): DataFrame = {
    require(fanout >= 1, s"fanout must be positive, got $fanout")
    // The replicate construction is only correct for left-oriented
    // joins: each right row exists once PER SALT, so a right/full outer
    // join would emit `fanout` copies of every unmatched right row
    // (each replica survives as its own null-extended output). Fail
    // loudly — same contract convention as Clusters.connectedComponents.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
      "leftanti", "anti")(jt),
      s"saltedReplicateJoin supports inner/left-oriented joins only, got '$joinType' " +
        "(an outer right side would duplicate unmatched right rows fanout times)")
    // A caller column named __salt would be silently clobbered by the
    // internal salt and dropped from the output — corrupt data, no error.
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "input already has a '__salt' column — rename it before calling saltedReplicateJoin")
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(fanout)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(fanout - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
