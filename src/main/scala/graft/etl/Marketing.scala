package graft.etl

import graft.functions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feed normalization for the marketing ETL (reference:
  * internal/etl/extractor.go + internal/models/ads.go,crm.go).
  *
  * The reference ingests two JSON feeds (Ads performance, CRM
  * opportunities). The driver's synthetic `events` table stands in for
  * both via the deterministic mapping in SURVEY §3 — view/click events
  * become ads rows, signup/error/purchase events become CRM rows — with
  * UTM attributes derived from stable row keys so Spark and the DuckDB
  * oracle agree bit-for-bit.
  */
object Marketing {

  /** Channel inference from UTM source/medium (reference:
    * internal/etl/transformer.go inferChannelFromUTM). A when-chain —
    * whole-stage-codegen'd, no UDF.
    */
  def inferChannel(utmSource: Column, utmMedium: Column): Column =
    when(utmSource === "google", "google_ads")
      .when(utmSource === "facebook", "facebook_ads")
      .when(utmSource === "tiktok", "tiktok_ads")
      .when(utmSource === "linkedin", "linkedin_ads")
      .otherwise(concat(utmSource, lit("_"), utmMedium))

  /** Lenient multi-format datetime parsing (reference:
    * internal/models/crm.go parseDateTime): normalize `/`→`-`, then try
    * the reference's 8 formats in order, first hit wins.
    * try_to_timestamp returns null on mismatch instead of failing the
    * task — the reference's fallback semantics, kept codegen-friendly.
    *
    * Format mapping (Go layout → Spark pattern):
    *   2006-01-02T15:04:05Z        → yyyy-MM-dd'T'HH:mm:ss'Z' (literal Z, UTC)
    *   2006-01-02 15:04:05         → yyyy-MM-dd HH:mm:ss
    *   2006-01-02                  → yyyy-MM-dd
    *   RFC3339 (Z07:00)            → yyyy-MM-dd'T'HH:mm:ssXXX
    *   RFC3339 + fraction (Go's Parse accepts an optional fraction)
    *                               → yyyy-MM-dd'T'HH:mm:ss.SSSXXX
    *   2006-01-02 15:04:05 -0700   → yyyy-MM-dd HH:mm:ss Z
    *   2006-01-02 15:04:05 MST     → yyyy-MM-dd HH:mm:ss zzz
    *   2006-01-02 15:04:05.000     → yyyy-MM-dd HH:mm:ss.SSS
    * Offset/zone-suffixed inputs resolve to their own UTC instant;
    * zoneless inputs resolve in the session time zone (UTC in every
    * graft session), matching Go's time.Parse semantics.
    */
  def parseDateTimeLenient(s: Column): Column =
    graft.functions.LenientTimestamp.lenient_timestamp(s)

  /** The declarative form [[parseDateTimeLenient]] replaces: kept for
    * the spec's compatibility check — the custom expression must
    * accept (and agree on) everything this 8-arm cascade accepts. The
    * expression is deliberately a superset: it also takes 1–9-digit
    * fractions and any RFC3339 offset form, like Go's time.Parse,
    * where the cascade's fixed patterns require exactly 3 digits /
    * ±hh:mm.
    */
  def parseDateTimeCascade(s: Column): Column = {
    val norm = regexp_replace(trim(s), "/", "-")
    coalesce(
      try_to_timestamp(norm, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(norm, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(norm, lit("yyyy-MM-dd")),
      try_to_timestamp(norm, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(norm, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(norm, lit("yyyy-MM-dd HH:mm:ss Z")),
      try_to_timestamp(norm, lit("yyyy-MM-dd HH:mm:ss zzz")),
      try_to_timestamp(norm, lit("yyyy-MM-dd HH:mm:ss.SSS")))
  }

  /** ALL six feed attributes from ONE per-row kernel pass
    * ([[graft.functions.FeedAttrs]]): date, channel, campaign_ads,
    * utm_campaign, utm_source, utm_medium. The six consumers below
    * select fields off this shared struct; whole-stage codegen's
    * subexpression elimination evaluates the kernel once per row.
    * Before r8 each feed query evaluated six separate expression trees
    * (two FirstInt extractions, a 4-arm channel when-chain, two concat
    * allocations, a date format) per row — the dominant scan-side cost
    * of the sf10 consolidation family.
    */
  private val attrs: Column =
    FeedAttrs.feed_attrs(col("ts"), col("user_id"), col("props"))

  /** Declarative twins of the [[FeedAttrs]] kernel fields, kept ONLY
    * for ExprSpec's bit-equality pin — the kernel must agree with these
    * on any input, including null/malformed corners. `first_int` is the
    * byte-scan TRY_CAST-lenient extraction (semantics match
    * `TRY_CAST(regexp_extract(props,'[0-9]+',0) AS INT)`: empty→null,
    * overflow→null — a deliberate error→NULL change versus the ANSI
    * cast, which raises on those payloads; ExprSpec pins the lenient
    * form).
    */
  private[graft] val declUtmSource: Column =
    element_at(
      array(lit("google"), lit("facebook"), lit("tiktok"), lit("linkedin"), lit("newsletter")),
      (col("user_id") % 5).cast("int") + 1)
  private[graft] val declUtmMedium: Column =
    when(col("user_id") % 2 === 0, "cpc").otherwise("social")
  private[graft] val declPropsK: Column = FirstInt.first_int(col("props"))
  private[graft] def declChannel: Column = inferChannel(declUtmSource, declUtmMedium)
  private[graft] def declCampaignAds: Column =
    concat(lit("C-10"), (declPropsK % 10).cast("string"))
  private[graft] def declUtmCampaign: Column =
    concat(lit("camp_"), (declPropsK % 20).cast("string"))

  /** Ads performance feed: one row per view/click event.
    * Columns mirror models/ads.go AdsPerformance.
    */
  def adsFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(
        col("event_id"),
        attrs.getField("date").as("date"),
        attrs.getField("campaign_ads").as("campaign_id"),
        attrs.getField("channel").as("channel"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("clicks"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("impressions"),
        col("value").as("cost"),
        attrs.getField("utm_campaign").as("utm_campaign"),
        attrs.getField("utm_source").as("utm_source"),
        attrs.getField("utm_medium").as("utm_medium"))

  /** Both feeds in ONE scan of events, already normalized to the
    * consolidation schema (the unioned shape Consolidate.metrics
    * produces from the two separate feeds). `adsFeed unionByName
    * crmFeed` reads the fact table twice; at 100 TB the second scan is
    * pure waste, so the registered consolidation queries use this fused
    * projection — every event becomes exactly one normalized row via
    * conditional columns, no union, no second scan. Equality with the
    * two-feed path is asserted in EtlSpec.
    */
  def unionedFeed(spark: SparkSession, dir: String): DataFrame =
    unionedFeedFrom(Tables.events(spark, dir))

  /** Same fused normalization over any events-shaped DataFrame —
    * including a `readStream` source (the streaming consolidation twin
    * runs this projection unchanged on the live feed).
    */
  def unionedFeedFrom(events: DataFrame): DataFrame = {
    val isAds = col("event_type").isin("view", "click")
    events
      // Only the five event types the two feeds recognize: without this,
      // any other type would become an all-zero-measure row with
      // campaign_id='' — a consolidation key the adsFeed∪crmFeed path
      // (and the oracle) would never produce. Equality with the union
      // path must hold semantically, not just on current testdata.
      .filter(col("event_type").isin("view", "click", "signup", "error", "purchase"))
      .select(
        attrs.getField("date").as("date"),
        attrs.getField("channel").as("channel"),
        when(isAds, attrs.getField("campaign_ads"))
          .otherwise("").as("campaign_id"),
        attrs.getField("utm_campaign").as("utm_campaign"),
        attrs.getField("utm_source").as("utm_source"),
        attrs.getField("utm_medium").as("utm_medium"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("clicks"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("impressions"),
        when(isAds, col("value")).otherwise(0.0).as("cost"),
        when(col("event_type") === "signup", 1L).otherwise(0L).as("leads"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("opportunities"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("closed_won"),
        when(col("event_type") === "purchase", col("value")).otherwise(0.0).as("revenue"))
  }

  /** Minimal phase-1 projection for the two-phase packed consolidation:
    * one primitive-long kernel call per row ([[graft.functions.FeedKeyLong]],
    * key = mkey·8+cls) plus the raw measure value — no struct, no
    * boxing, no per-row branching at all. The per-class measure split
    * happens AFTER the first aggregate, once per (mkey, cls) group
    * ([[Consolidate.metricsPacked]]).
    */
  def packedRows(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("view", "click", "signup", "error", "purchase"))
      .select(
        FeedKey.feed_key_long(col("ts"), col("user_id"), col("props"),
          col("event_type")).as("pk"),
        col("value"))

  /** CRM opportunities feed: one row per signup/error/purchase event,
    * stage-mapped (signup→lead, error→opportunity, purchase→closed_won).
    * Columns mirror models/crm.go CRMOpportunity — including the
    * passthrough identifiers opportunity_id and contact_email
    * (models/crm.go:8-20, returned verbatim by debugCRM), derived as
    * deterministic stand-ins from the event key / user key so the
    * DuckDB oracle can hash-check them. Channel is inferred from UTM
    * because CRM rows carry no campaign_id (transformer.go).
    */
  def crmFeed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "error", "purchase"))
      .select(
        col("event_id"),
        attrs.getField("date").as("date"),
        concat(lit("O-"), col("event_id").cast("string")).as("opportunity_id"),
        concat(lit("user"), col("user_id").cast("string"), lit("@example.com"))
          .as("contact_email"),
        when(col("event_type") === "signup", "lead")
          .when(col("event_type") === "error", "opportunity")
          .otherwise("closed_won").as("stage"),
        col("value").as("amount"),
        attrs.getField("channel").as("channel"),
        attrs.getField("utm_campaign").as("utm_campaign"),
        attrs.getField("utm_source").as("utm_source"),
        attrs.getField("utm_medium").as("utm_medium"))

  /** Ingest stamping (reference: internal/etl/extractor.go:58-76 —
    * every extracted ads/CRM row carries IngestedAt = fetch wall-clock
    * time). Inherently nondeterministic, so it lives on a separate
    * wrapper surface: the hash-checked extract queries stay
    * deterministic, and the stamped twins are registered rows-only.
    */
  def stamped(feed: DataFrame): DataFrame =
    feed.withColumn("ingested_at", current_timestamp())
}
