package graft.etl

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MetricKey consolidation + derived metrics (reference:
  * internal/etl/transformer.go Transform / calculateDerivedMetrics).
  *
  * The reference's per-key map accumulation becomes one shuffle: both
  * feeds are normalized to a shared schema, unioned, and aggregated on
  * the six-column MetricKey. Partial aggregation (map-side combine)
  * keeps the shuffle at O(distinct keys); since the key contains date,
  * it distributes evenly at any scale and re-running the pipeline is
  * idempotent — same keys, same consolidated rows.
  */
object Consolidate {

  val keyCols: Seq[String] =
    Seq("date", "channel", "campaign_id", "utm_campaign", "utm_source", "utm_medium")

  /** Normalize both feeds to the metrics schema and consolidate.
    * Ads rows carry clicks/impressions/cost; CRM rows carry stage counts
    * and revenue, with campaign_id = '' (transformer.go: CRM has no
    * campaign). Like the reference, ads and CRM rows only merge when the
    * whole key matches.
    */
  def metrics(ads: DataFrame, crm: DataFrame): DataFrame = {
    val adsNorm = ads.select(
      col("date"), col("channel"), col("campaign_id"),
      col("utm_campaign"), col("utm_source"), col("utm_medium"),
      col("clicks"), col("impressions"), col("cost"),
      lit(0L).as("leads"), lit(0L).as("opportunities"), lit(0L).as("closed_won"),
      lit(0.0).as("revenue"))
    val crmNorm = crm.select(
      col("date"), col("channel"), lit("").as("campaign_id"),
      col("utm_campaign"), col("utm_source"), col("utm_medium"),
      lit(0L).as("clicks"), lit(0L).as("impressions"), lit(0.0).as("cost"),
      when(col("stage") === "lead", 1L).otherwise(0L).as("leads"),
      when(col("stage") === "opportunity", 1L).otherwise(0L).as("opportunities"),
      when(col("stage") === "closed_won", 1L).otherwise(0L).as("closed_won"),
      when(col("stage") === "closed_won", col("amount")).otherwise(0.0).as("revenue"))
    consolidateNormalized(adsNorm.unionByName(crmNorm))
  }

  /** Consolidate rows already in the normalized unioned schema — shared
    * by the two-feed path above and the single-scan fused path
    * (Marketing.unionedFeed).
    */
  def consolidateNormalized(unioned: DataFrame): DataFrame =
    unioned
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("clicks")).as("clicks"),
        sum(col("impressions")).as("impressions"),
        dsum(col("cost")).as("cost"),
        sum(col("leads")).as("leads"),
        sum(col("opportunities")).as("opportunities"),
        sum(col("closed_won")).as("closed_won"),
        dsum(col("revenue")).as("revenue"))

  /** Packed fast path for the batch consolidation: group on
    * [[graft.functions.FeedKey]]'s 35-bit integer MetricKey and expand
    * the six key strings once per GROUP after the aggregate
    * ([[graft.functions.FeedKeyExpand]]). Same groups, same sums, same
    * output schema as [[consolidateNormalized]] over the unioned feed —
    * the packing is injective w.r.t. the string 6-tuple and EtlSpec
    * pins row-set equality — but the 100M-row-scale hash aggregation
    * probes on one long instead of building and hashing a 6-string
    * UnsafeRow per row. The string-key path remains the general API
    * (streaming twin, arbitrary normalized feeds, out-of-civil-range
    * timestamps).
    */
  def metricsPacked(events: DataFrame): DataFrame = {
    // Phase 1: group on the primitive packed long (mkey·8 + cls) with
    // the two cheapest possible per-row updates — a row count and one
    // exact fixed-point value sum. All measure branching moves to
    // phase 2, which runs once per (mkey, cls) GROUP (≤ 5 rows per
    // final key) instead of once per input row.
    val p1 = Marketing.packedRows(events)
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("vsum"))
    val cls = col("pk").bitwiseAND(7L).cast("int")
    // Phase 2: split (cnt, vsum) into the seven measures by class and
    // re-aggregate on the bare mkey. `.otherwise(0.0)` on cost/revenue
    // mirrors the string path's per-row projection: a key with only
    // CRM rows has cost 0.0 (not NULL), and vice versa for revenue;
    // an all-NULL-value class keeps vsum NULL, which dsum skips —
    // identical NULL algebra to summing the per-row columns.
    // Phase-1 sums are exact multiples of 10^-4 below 2^53, so the
    // phase-2 dsum re-scales them losslessly: the composed sum is
    // bit-identical to the single-phase one.
    val agg = p1
      .select(shiftright(col("pk"), 3).as("mkey"), cls.as("cls"),
        col("cnt"), col("vsum"))
      .groupBy(col("mkey"))
      .agg(
        sum(when(col("cls") === 1, col("cnt")).otherwise(0L)).as("clicks"),
        sum(when(col("cls") === 0, col("cnt")).otherwise(0L)).as("impressions"),
        dsum(when(col("cls") <= 1, col("vsum")).otherwise(0.0)).as("cost"),
        sum(when(col("cls") === 2, col("cnt")).otherwise(0L)).as("leads"),
        sum(when(col("cls") === 3, col("cnt")).otherwise(0L)).as("opportunities"),
        sum(when(col("cls") === 4, col("cnt")).otherwise(0L)).as("closed_won"),
        dsum(when(col("cls") === 4, col("vsum")).otherwise(0.0)).as("revenue"))
    val ex = FeedKeyExpand.feed_key_expand(col("mkey"))
    agg.select(
      keyCols.map(f => ex.getField(f).as(f)) ++
        Seq("clicks", "impressions", "cost", "leads",
          "opportunities", "closed_won", "revenue").map(col): _*)
  }

  /** Derived metrics with the reference's divide-by-zero→0 guards.
    * Pure post-aggregation column expressions — no extra shuffle.
    */
  def withDerived(consolidated: DataFrame): DataFrame =
    consolidated
      .withColumn("cpc", divSafe(col("cost"), col("clicks").cast("double")))
      .withColumn("cpa", divSafe(col("cost"), col("leads").cast("double")))
      .withColumn("cvr_lead_to_opp",
        divSafe(col("opportunities").cast("double"), col("leads").cast("double")))
      .withColumn("cvr_opp_to_won",
        divSafe(col("closed_won").cast("double"), col("opportunities").cast("double")))
      .withColumn("roas", divSafe(col("revenue"), col("cost")))
}
