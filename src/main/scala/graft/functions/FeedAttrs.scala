package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, TimeZoneAwareExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.ZoneId

/** ALL per-row marketing feed attributes in ONE codegen'd kernel:
  * (ts, user_id, props) → struct(date, channel, campaign_ads,
  * utm_campaign, utm_source, utm_medium).
  *
  * Replaces the six separate expression trees the feed projections used
  * to evaluate per row (reference: extractor.go feed normalization +
  * transformer.go inferChannelFromUTM — SURVEY §3's deterministic
  * events→marketing mapping). The declarative pile re-derived
  * `first_int(props)` twice, walked a 4-arm `when` chain for the
  * channel, and concat-allocated campaign/utm strings on every row of
  * the 100M-row sf10 events scan. Here every output except the date is
  * a lookup into a STATIC interned-UTF8String table — the channel,
  * source, medium, campaign and utm_campaign domains are all small
  * fixed domains (5×2 / 10 / 20 values) — so the kernel does one
  * FirstInt byte scan, one DateStr civil-date conversion, two integer
  * mods, and six array reads per row, with zero allocation beyond the
  * result row.
  *
  * Null semantics are pinned bit-identical to the declarative forms
  * they replace (ExprSpec):
  *   - ts null → date null (like `dstr`);
  *   - user_id null → utm_source/channel null, but utm_medium =
  *     'social' (the `when(uid % 2 === 0, 'cpc').otherwise('social')`
  *     fall-through on a null predicate);
  *   - props null or digit-free → campaign_ads/utm_campaign null
  *     (concat over a null k);
  *   - user_id % 5 == -1 → error, matching ANSI `element_at`'s
  *     index-0 rejection; other negative remainders count from the
  *     array end like a negative element_at index.
  *
  * The six consumers select fields off ONE shared struct; whole-stage
  * codegen's subexpression elimination evaluates the kernel once per
  * row (PlanSpec pins a single `feed_attrs` occurrence in the codegen).
  */
case class FeedAttrs(first: Expression, second: Expression, third: Expression,
                     timeZoneId: Option[String] = None)
    extends TernaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = FeedAttrs.Schema
  override def nullable: Boolean = false
  override def prettyName: String = "feed_attrs"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (TimestampType | TimestampNTZType, LongType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, u, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (timestamp, bigint, string), got " +
          s"(${t.simpleString}, ${u.simpleString}, ${p.simpleString})")
    }

  /** NTZ micros are wall-clock local — no zone conversion, like [[DateStr]]. */
  private def isNtz: Boolean = first.dataType == TimestampNTZType

  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    val u = second.eval(input)
    val p = third.eval(input)
    FeedAttrs.attrs(
      t == null, if (t == null) 0L else t.asInstanceOf[Long],
      if (isNtz) null else zoneId,
      u == null, if (u == null) 0L else u.asInstanceOf[Long],
      p.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = first.genCode(ctx)
    val u = second.genCode(ctx)
    val p = third.genCode(ctx)
    val zone =
      if (isNtz) "((java.time.ZoneId) null)"
      else ctx.addReferenceObj("zoneId", zoneId, "java.time.ZoneId")
    ev.copy(
      code = code"""
        ${t.code}
        ${u.code}
        ${p.code}
        InternalRow ${ev.value} = graft.functions.FeedAttrs.attrs(
          ${t.isNull}, ${t.value}, $zone, ${u.isNull}, ${u.value},
          ${p.isNull} ? null : ${p.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object FeedAttrs {

  val Schema: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("channel", StringType),
    StructField("campaign_ads", StringType),
    StructField("utm_campaign", StringType),
    StructField("utm_source", StringType),
    StructField("utm_medium", StringType)))

  private[functions] val Sources: Array[UTF8String] =
    Array("google", "facebook", "tiktok", "linkedin", "newsletter")
      .map(UTF8String.fromString)
  private[functions] val Mediums: Array[UTF8String] =
    Array("cpc", "social").map(UTF8String.fromString)
  /** channel[sourceIdx][mediumIdx] — inferChannelFromUTM precomputed
    * over its whole 5×2 input domain (transformer.go: the four known
    * sources map to fixed *_ads channels; anything else concatenates
    * source_medium). Shared with [[FeedKeyExpand]].
    */
  private[functions] val Channels: Array[Array[UTF8String]] =
    Array("google_ads", "facebook_ads", "tiktok_ads", "linkedin_ads").map { ch =>
      Array.fill(2)(UTF8String.fromString(ch))
    } :+ Mediums.map(m => UTF8String.fromString("newsletter_" + m.toString))
  private[functions] val CampaignAds: Array[UTF8String] =
    Array.tabulate(10)(i => UTF8String.fromString("C-10" + i))
  private[functions] val UtmCampaigns: Array[UTF8String] =
    Array.tabulate(20)(i => UTF8String.fromString("camp_" + i))

  /** Static kernel shared by the interpreted and codegen paths.
    * `zid == null` means TIMESTAMP_NTZ (wall-clock local micros).
    */
  def attrs(tsNull: Boolean, tsMicros: Long, zid: ZoneId,
            uidNull: Boolean, uid: Long, props: UTF8String): InternalRow = {
    val out = new Array[Any](6)
    if (!tsNull)
      out(0) = if (zid == null) DateStr.formatNtz(tsMicros) else DateStr.format(tsMicros, zid)
    if (!uidNull) {
      val rem = (uid % 5L).toInt
      val si =
        if (rem >= 0) rem
        else if (rem == -1) throw new IllegalArgumentException(
          "feed_attrs: element_at index 0 (user_id % 5 == -1); SQL array indices start at 1")
        else 6 + rem // negative element_at index counts from the array end
      val mi = if (uid % 2L == 0L) 0 else 1
      out(1) = Channels(si)(mi)
      out(4) = Sources(si)
      out(5) = Mediums(mi)
    } else {
      out(5) = Mediums(1) // when(null % 2 === 0, ...).otherwise('social')
    }
    if (props != null) {
      val k = FirstInt.extract(props)
      if (k != null) {
        out(2) = CampaignAds(k.intValue % 10)
        out(3) = UtmCampaigns(k.intValue % 20)
      }
    }
    new GenericInternalRow(out)
  }

  def feed_attrs(ts: Column, userId: Column, props: Column): Column =
    GraftColumn.column(FeedAttrs(
      GraftColumn.expression(ts),
      GraftColumn.expression(userId),
      GraftColumn.expression(props)))
}
