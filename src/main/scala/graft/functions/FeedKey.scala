package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.ZoneId

/** Packed numeric consolidation key: (ts, user_id, props, event_type) →
  * one primitive BIGINT `mkey << 3 | cls` — the whole 6-string
  * MetricKey (reference: transformer.go's date/channel/campaign/utm
  * composite) folded into a 35-bit integer `mkey`, plus the 3-bit
  * event classification `cls` the measure derivation branches on.
  *
  * Purpose: the consolidation aggregation's per-row cost is dominated
  * by building and hashing a 6-string UnsafeRow group key. Every one
  * of those strings is a pure function of (epochDay(ts), user_id mod
  * 10, first_int(props), ads/crm class) — small bounded domains — so
  * the aggregation can group on this packed long instead and
  * reconstruct the strings AFTER the aggregate via [[FeedKeyExpand]],
  * once per group instead of once per row. Packing is injective with
  * respect to the string key (distinct packed keys ⇔ distinct string
  * 6-tuples, including the null corners), so group sets — and the
  * oracle hash — are bit-identical to grouping on the strings
  * (EtlSpec pins packed-path = string-path equality).
  *
  * Layout (35 bits): epochDay+719162 (22 bits, null ts → 0x3FFFFF) ·
  * si (3 bits: source index 0-4, null user_id → 7) · mi (1 bit:
  * cpc/social) · k20 (5 bits: k mod 20, null k → 31) · camp (4 bits:
  * ads k mod 10, ads null-k → 14, crm → 15).
  *
  * cls: view=0 click=1 signup=2 error=3 purchase=4, anything else
  * (incl. null) → sentinel 7 — callers filter to the five feed types,
  * exactly like the string-path projection.
  *
  * Contract: timestamps must land in civil years [1, 9999] (22-bit
  * day budget). Outside that range the kernel throws a clear error
  * rather than silently merging groups — malformed feed rows at the
  * year-10000 boundary are a data-quality failure, and the generic
  * string-key path ([[graft.etl.Consolidate.consolidateNormalized]])
  * remains available for such data.
  */
object FeedKey {

  private[functions] val DayNull = 0x3FFFFFL          // 22-bit sentinel
  private[functions] val DayOffset = 719162L          // epochDay of year 1
  private val DayMax = 2932896L + DayOffset           // year 9999

  private val EventTypes: Array[UTF8String] =
    Array("view", "click", "signup", "error", "purchase").map(UTF8String.fromString)

  /** The 35-bit MetricKey and the 3-bit event class in ONE primitive
    * long: `mkey << 3 | (cls & 7)` (cls −1 → sentinel 7). Allocation-
    * free static core of [[FeedKeyLong]]: the consolidation's phase-1
    * aggregation groups on this long with zero per-row object churn.
    */
  def pack(tsNull: Boolean, tsMicros: Long, zid: ZoneId,
           uidNull: Boolean, uid: Long, props: UTF8String,
           eventType: UTF8String): Long = {
    var cls = -1
    if (eventType != null) {
      var i = 0
      while (i < 5 && cls < 0) { if (eventType.equals(EventTypes(i))) cls = i; i += 1 }
    }
    val dOff =
      if (tsNull) DayNull
      else {
        val d = DateStr.epochDayOf(tsMicros, zid) + DayOffset
        if (d < 0L || d > DayMax) throw new IllegalArgumentException(
          s"feed_key: timestamp epoch day ${d - DayOffset} outside civil years [1, 9999]; " +
            "use the string-key consolidation path for out-of-range data")
        d
      }
    val si =
      if (uidNull) 7L
      else {
        val rem = (uid % 5L).toInt
        if (rem >= 0) rem.toLong
        else if (rem == -1) throw new IllegalArgumentException(
          "feed_key: element_at index 0 (user_id % 5 == -1); SQL array indices start at 1")
        else (6 + rem).toLong
      }
    val mi = if (!uidNull && uid % 2L == 0L) 0L else 1L
    val k = if (props == null) null else FirstInt.extract(props)
    val k20 = if (k == null) 31L else (k.intValue % 20).toLong
    val camp =
      if (cls > 1) 15L                       // crm: campaign_id = ''
      else if (k == null) 14L                // ads with null k: campaign_id null
      else (k.intValue % 10).toLong
    val key = dOff << 13 | si << 10 | mi << 9 | k20 << 4 | camp
    key << 3 | (cls & 7).toLong
  }

  def feed_key_long(ts: Column, userId: Column, props: Column, eventType: Column): Column =
    GraftColumn.column(FeedKeyLong(
      GraftColumn.expression(ts), GraftColumn.expression(userId),
      GraftColumn.expression(props), GraftColumn.expression(eventType)))
}

/** [[FeedKey]]'s packing as a primitive BIGINT (`mkey << 3 | cls`, cls
  * −1 → 7): the consolidation hot path groups directly on this long —
  * no per-row struct allocation, no boxing, and the downstream measure
  * derivation branches on `pk & 7` once per (mkey, cls) GROUP instead
  * of once per row ([[graft.etl.Consolidate.metricsPacked]]).
  */
case class FeedKeyLong(first: Expression, second: Expression, third: Expression,
                       fourth: Expression, timeZoneId: Option[String] = None)
    extends QuaternaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "feed_key_long"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (TimestampType | TimestampNTZType, LongType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, u, p, e) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (timestamp, bigint, string, string), got " +
          s"(${t.simpleString}, ${u.simpleString}, ${p.simpleString}, ${e.simpleString})")
    }

  private def isNtz: Boolean = first.dataType == TimestampNTZType

  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    val u = second.eval(input)
    val p = third.eval(input)
    val e = fourth.eval(input)
    FeedKey.pack(
      t == null, if (t == null) 0L else t.asInstanceOf[Long],
      if (isNtz) null else zoneId,
      u == null, if (u == null) 0L else u.asInstanceOf[Long],
      p.asInstanceOf[UTF8String], e.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = first.genCode(ctx)
    val u = second.genCode(ctx)
    val p = third.genCode(ctx)
    val e = fourth.genCode(ctx)
    val zone =
      if (isNtz) "((java.time.ZoneId) null)"
      else ctx.addReferenceObj("zoneId", zoneId, "java.time.ZoneId")
    ev.copy(
      code = code"""
        ${t.code}
        ${u.code}
        ${p.code}
        ${e.code}
        long ${ev.value} = graft.functions.FeedKey.pack(
          ${t.isNull}, ${t.value}, $zone, ${u.isNull}, ${u.value},
          ${p.isNull} ? null : ${p.value}, ${e.isNull} ? null : ${e.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Inverse of [[FeedKey]]'s packing: packed bigint → the six MetricKey
  * strings (date, channel, campaign_id, utm_campaign, utm_source,
  * utm_medium). Runs above the aggregate — once per GROUP (thousands of
  * rows), so it reuses [[FeedAttrs]]'s interned domain tables and only
  * the date string is built per call.
  */
case class FeedKeyExpand(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FeedKeyExpand.Schema
  override def nullable: Boolean = false
  override def prettyName: String = "feed_key_expand"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${t.simpleString}")
  }

  override def nullSafeEval(key: Any): Any =
    FeedKeyExpand.expand(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k => s"graft.functions.FeedKeyExpand.expand($k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeedKeyExpand {

  val Schema: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("channel", StringType),
    StructField("campaign_id", StringType),
    StructField("utm_campaign", StringType),
    StructField("utm_source", StringType),
    StructField("utm_medium", StringType)))

  import FeedAttrs.{CampaignAds, Channels, Mediums, Sources, UtmCampaigns}
  private val Empty = UTF8String.fromString("")

  def expand(key: Long): InternalRow = {
    val dOff = key >>> 13
    val si = (key >> 10 & 0x7L).toInt
    val mi = (key >> 9 & 0x1L).toInt
    val k20 = (key >> 4 & 0x1FL).toInt
    val camp = (key & 0xFL).toInt
    val out = new Array[Any](6)
    if (dOff != FeedKey.DayNull)
      out(0) = DateStr.civilString(dOff - FeedKey.DayOffset)
    if (si != 7) {
      out(1) = Channels(si)(mi)
      out(4) = Sources(si)
    }
    out(2) =
      if (camp == 15) Empty
      else if (camp == 14) null
      else CampaignAds(camp)
    if (k20 != 31) out(3) = UtmCampaigns(k20)
    out(5) = Mediums(mi)
    new GenericInternalRow(out)
  }

  def feed_key_expand(key: Column): Column =
    GraftColumn.column(FeedKeyExpand(GraftColumn.expression(key)))
}
