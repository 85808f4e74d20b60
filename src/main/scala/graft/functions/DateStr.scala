package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import java.time.{Instant, ZoneId}

/** Timestamp → 'yyyy-MM-dd' string — `date_format(ts, 'yyyy-MM-dd')`
  * without the per-row DateTimeFormatter walk: zone offset resolved
  * once (or per-row only for DST zones), then pure integer civil-date
  * arithmetic and direct digit writes into a 10-byte buffer. Measured
  * over the 100M-row sf10 events scan: the formatter form costs
  * ~0.18 s of per-row overhead above the scan floor; this is the
  * hottest column expression in every date-keyed feed query (the
  * consolidation key, daily exports, q3/q13's group keys).
  *
  * [[TimeZoneAwareExpression]]: the analyzer injects the session time
  * zone exactly as for the built-in `date_format`, so semantics track
  * the session like the form it replaces. Years outside [1, 9999]
  * fall back to java.time formatting (year-of-era, like the pattern
  * letter 'y'); ExprSpec pins bit-equality with `date_format` across
  * the full civil range and on real data.
  */
case class DateStr(child: Expression, timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "date_str"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires timestamp or timestamp_ntz, got ${t.simpleString}")
  }

  /** NTZ micros are already wall-clock local — `date_format` applies no
    * zone conversion to them, and neither do we (the scale-ladder
    * parquet surfaces event/order timestamps as TIMESTAMP_NTZ).
    */
  private def isNtz: Boolean = child.dataType == TimestampNTZType

  override def nullSafeEval(micros: Any): Any =
    if (isNtz) DateStr.formatNtz(micros.asInstanceOf[Long])
    else DateStr.format(micros.asInstanceOf[Long], zoneId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isNtz) {
      defineCodeGen(ctx, ev, m => s"graft.functions.DateStr.formatNtz($m)")
    } else {
      val zone = ctx.addReferenceObj("zoneId", zoneId, "java.time.ZoneId")
      defineCodeGen(ctx, ev, m => s"graft.functions.DateStr.format($m, $zone)")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DateStr {

  private val MicrosPerSecond = 1000000L
  private val MicrosPerDay = 86400L * MicrosPerSecond

  /** Shared interpreted/codegen kernel: epoch micros → 'yyyy-MM-dd' in
    * `zid`. Fixed-offset zones (UTC, the graft session default) skip
    * the per-row rules lookup entirely.
    */
  def format(micros: Long, zid: ZoneId): UTF8String =
    formatCivil(epochDayOf(micros, zid))

  /** TIMESTAMP_NTZ kernel: micros are wall-clock local, no zone math. */
  def formatNtz(micros: Long): UTF8String =
    formatCivil(Math.floorDiv(micros, MicrosPerDay))

  /** Local epoch day of a timestamp — the integer the civil date string
    * is derived from. `zid == null` means TIMESTAMP_NTZ (no zone math).
    * Shared with [[FeedKey]], whose packed group key carries this value
    * instead of the formatted string.
    */
  private[functions] def epochDayOf(micros: Long, zid: ZoneId): Long =
    if (zid == null) Math.floorDiv(micros, MicrosPerDay)
    else {
      val rules = zid.getRules
      val offsetSec =
        if (rules.isFixedOffset) rules.getOffset(Instant.EPOCH).getTotalSeconds
        else rules.getOffset(Instant.ofEpochSecond(
          Math.floorDiv(micros, MicrosPerSecond),
          (Math.floorMod(micros, MicrosPerSecond) * 1000L).toInt)).getTotalSeconds
      Math.floorDiv(micros + offsetSec * MicrosPerSecond, MicrosPerDay)
    }

  /** 'yyyy-MM-dd' of an epoch day ([[FeedKeyExpand]]'s post-aggregation
    * date reconstruction — runs once per GROUP, not per row).
    */
  private[functions] def civilString(epochDay: Long): UTF8String =
    formatCivil(epochDay)

  /** epochDay → 'yyyy-MM-dd' UTF8String. Civil-from-days is Howard
    * Hinnant's proleptic-Gregorian algorithm (the LocalDate.ofEpochDay
    * result, pure integer arithmetic); years [1, 9999] take the
    * direct-digit-write fast path.
    */
  private def formatCivil(epochDay: Long): UTF8String = {
    val z = epochDay + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460L + doe / 36524L - doe / 146096L) / 365L
    val y0 = yoe + era * 400L
    val doy = doe - (365L * yoe + yoe / 4L - yoe / 100L)
    val mp = (5L * doy + 2L) / 153L
    val d = (doy - (153L * mp + 2L) / 5L + 1L).toInt
    val m = (if (mp < 10L) mp + 3L else mp - 9L).toInt
    val y = if (m <= 2) y0 + 1L else y0

    if (y < 1L || y > 9999L) {
      // out of the 4-digit civil range: year-of-era semantics like
      // date_format's 'y' — delegate to java.time
      val ld = java.time.LocalDate.ofEpochDay(epochDay)
      return UTF8String.fromString(
        ld.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")))
    }
    val b = new Array[Byte](10)
    var yy = y.toInt
    b(3) = ('0' + yy % 10).toByte; yy /= 10
    b(2) = ('0' + yy % 10).toByte; yy /= 10
    b(1) = ('0' + yy % 10).toByte; yy /= 10
    b(0) = ('0' + yy).toByte
    b(4) = '-'
    b(5) = ('0' + m / 10).toByte
    b(6) = ('0' + m % 10).toByte
    b(7) = '-'
    b(8) = ('0' + d / 10).toByte
    b(9) = ('0' + d % 10).toByte
    UTF8String.fromBytes(b)
  }

  def date_str(ts: Column): Column =
    GraftColumn.column(DateStr(GraftColumn.expression(ts)))
}
