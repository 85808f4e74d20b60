package graft.etl

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query surface over consolidated metrics (reference:
  * internal/api/handlers.go + internal/storage/memory.go).
  *
  * Filters land before any shuffle; with date-partitioned metrics
  * storage every one of these prunes partitions instead of scanning.
  * Pagination is a window rank, not a driver-side slice — the reference
  * slices an in-memory array, which is exactly what does NOT scale.
  */
object MetricsQueries {

  def metrics(spark: SparkSession, dir: String): DataFrame =
    Consolidate.withDerived(
      Consolidate.metricsPacked(graft.sources.Tables.events(spark, dir)))

  /** [[metrics]] with a redundant ts prefilter for date-bounded queries
    * (r18, guide §6/§2.3): `date` is [[DateStr.epochDayOf]] of `ts` at
    * UTC — a pure function of ts — so a civil-date bound [from, to]
    * (inclusive ISO strings) is exactly the half-open ts range
    * [fromT00:00Z, (to+1d)T00:00Z), and null-ts rows (date = null) fail
    * both forms. The callers' date predicates stay, so results are
    * identical with or without the prefilter; what the conjunct buys is
    * a plain range predicate on the STORED ts column: it reaches the
    * scan's PushedFilters (partition / row-group pruning on any
    * time-clustered event store) and short-circuits the per-row
    * feed-key packing for out-of-range rows, which a predicate on the
    * packed key's date field never can.
    */
  def metricsForDays(spark: SparkSession, dir: String,
                     from: String, toInclusive: Option[String]): DataFrame = {
    val lo = java.time.Instant.parse(s"${from}T00:00:00Z")
    val ev0 = graft.sources.Tables.events(spark, dir)
      .filter(col("ts") >= lit(lo))
    val ev = toInclusive.fold(ev0) { t =>
      val hi = java.time.Instant.parse(s"${t}T00:00:00Z")
        .plus(java.time.Duration.ofDays(1))
      ev0.filter(col("ts") < lit(hi))
    }
    Consolidate.withDerived(Consolidate.metricsPacked(ev))
  }

  /** FilterByDate(since): keep date >= since (transformer.go). */
  def filterSince(m: DataFrame, since: String): DataFrame =
    m.filter(col("date") >= since)

  /** /metrics/channel: channel + inclusive date range, deterministic
    * order, limit/offset pagination (memory.go GetMetricsByChannel +
    * handlers.go pagination).
    *
    * Scale note: `orderBy.limit(offset+limit)` compiles to
    * TakeOrderedAndProject — each task keeps its local top-(offset+limit)
    * and only those tiny heaps reach the driver-side merge, so there is
    * no single-partition shuffle of the full filtered set (which a
    * global row_number window would force). The row_number that drops
    * the first `offset` rows then runs over at most offset+limit rows —
    * bounded by the page size, not the data size.
    */
  def channelQuery(m: DataFrame, channel: String, from: String, to: String,
                   limit: Int, offset: Int): DataFrame = {
    val sortKeys = Seq(
      col("date"), col("campaign_id"), col("utm_campaign"),
      col("utm_source"), col("utm_medium"))
    val page = m
      .filter(col("channel") === channel && col("date") >= from && col("date") <= to)
      .orderBy(sortKeys: _*)
      .limit(offset + limit)
    page
      .withColumn("rn", row_number().over(Window.orderBy(sortKeys: _*)))
      .filter(col("rn") > offset)
      .drop("rn")
  }

  /** /metrics/funnel: utm_campaign + date range (memory.go
    * GetMetricsByCampaign).
    *
    * presentSorted contract: the result is bounded by days-in-range ×
    * the UTM attribute domain (channel × campaign_id × source ×
    * medium) — request-bounded, not data-bounded — so the
    * single-partition presentation sort is safe for any fixed request.
    * PlanSpec's audit pins a ceiling for the registered 21-day call.
    */
  def funnelQuery(m: DataFrame, campaign: String, from: String, to: String): DataFrame =
    m.filter(col("utm_campaign") === campaign && col("date") >= from && col("date") <= to)
      .transform(presentSorted(_, col("date"), col("channel"), col("campaign_id"),
        col("utm_source"), col("utm_medium")))

  /** /export/run: one date, re-consolidated on (channel, campaign_id,
    * utm_campaign) with derived metrics recalculated (handlers.go
    * consolidateMetricsByDate). Second-level aggregation of already-
    * consolidated rows — tiny shuffle, O(channels×campaigns).
    */
  def exportDaily(m: DataFrame, date: String): DataFrame =
    Consolidate.withDerived(
      m.filter(col("date") === date)
        .groupBy(col("channel"), col("campaign_id"), col("utm_campaign"))
        .agg(
          sum(col("clicks")).as("clicks"),
          sum(col("impressions")).as("impressions"),
          dsum(col("cost")).as("cost"),
          sum(col("leads")).as("leads"),
          sum(col("opportunities")).as("opportunities"),
          sum(col("closed_won")).as("closed_won"),
          dsum(col("revenue")).as("revenue")))

  /** /debug/matches: both feeds filtered to one utm_campaign, summarized
    * per side (handlers.go debugMatches returns the two match lists).
    */
  def matches(ads: DataFrame, crm: DataFrame, campaign: String): DataFrame = {
    val a = ads.filter(col("utm_campaign") === campaign)
      .agg(count(lit(1)).as("n"), dsum(col("cost")).as("total_value"))
      .select(lit("ads").as("side"), col("n"), col("total_value"))
    val c = crm.filter(col("utm_campaign") === campaign)
      .agg(count(lit(1)).as("n"), dsum(col("amount")).as("total_value"))
      .select(lit("crm").as("side"), col("n"), col("total_value"))
    a.unionByName(c).transform(presentSorted(_, col("side")))
  }
}
