package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import java.time._
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Lenient multi-format timestamp parsing (reference:
  * internal/models/crm.go parseDateTime — 8 accepted layouts with
  * `/`→`-` normalization, first match wins, failure → null).
  *
  * The declarative form — `coalesce(try_to_timestamp(norm, fmt1), …,
  * try_to_timestamp(norm, fmt8))` — attempts ~4.5 full parses per row
  * on mixed-format feeds because each arm can only fail by throwing
  * internally. This expression inspects the string's *shape* (length,
  * 'T' separator, offset/zone suffix, fractional part) and dispatches
  * straight to the one matching java.time formatter: one parse attempt
  * per row. Accepted shapes and their reference layouts:
  *
  *   2006-01-02T15:04:05Z / RFC3339 ±hh:mm / with .fraction   (T forms)
  *   2006-01-02 15:04:05 [±hhmm | zone-name | .fraction]      (space forms)
  *   2006-01-02                                               (date only)
  *
  * Zone-suffixed inputs resolve to their own UTC instant like Go's
  * time.Parse; zoneless inputs resolve in the session time zone —
  * [[TimeZoneAwareExpression]], so the analyzer's ResolveTimeZone rule
  * injects `spark.sql.session.timeZone` exactly as it does for the
  * built-in timestamp functions.
  */
case class LenientTimestamp(child: Expression,
                            timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "lenient_timestamp"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    LenientTimestamp.parse(s.asInstanceOf[UTF8String], zoneId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("parsedTs")
      val zone = ctx.addReferenceObj("zoneId", zoneId, "java.time.ZoneId")
      s"""
         |java.lang.Long $boxed = graft.functions.LenientTimestamp.parse($c, $zone);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LenientTimestamp {
  private val dateTime =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss", Locale.US)
  // 1-9 fractional digits, like Go's time.Parse and Spark's lenient
  // 'SSS' (which accepts 1-3): strictly more forgiving than either.
  private val dateTimeFrac = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
    .toFormatter(Locale.US)
  private val dateTimeOffset =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss Z", Locale.US)
  private val dateTimeZone =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss zzz", Locale.US)
  private val isoOffset = DateTimeFormatter.ISO_OFFSET_DATE_TIME // handles Z, ±hh:mm, fractions

  /** Returns epoch micros, or null on unparseable input; `zid`
    * (resolved once by the expression, not per row) anchors zoneless
    * inputs. Static entry point shared by the interpreted and codegen
    * paths.
    */
  def parse(u: UTF8String, zid: ZoneId): java.lang.Long = {
    if (u == null) return null
    val s = u.toString.trim.replace('/', '-')
    val n = s.length
    try {
      if (n == 10) {
        // 2006-01-02
        val d = LocalDate.parse(s)
        micros(d.atStartOfDay(zid).toInstant)
      } else if (n > 10 && s.charAt(10) == 'T') {
        // RFC3339 family: ...Z | ...±hh:mm | with optional fraction
        micros(OffsetDateTime.parse(s, isoOffset).toInstant)
      } else if (n > 19 && s.charAt(19) == ' ') {
        val suffix = s.substring(20)
        if (suffix.nonEmpty && (suffix.charAt(0) == '+' || suffix.charAt(0) == '-'))
          micros(OffsetDateTime.parse(s, dateTimeOffset).toInstant) //  ... -0700
        else
          micros(ZonedDateTime.parse(s, dateTimeZone).toInstant)    //  ... MST
      } else if (n > 19 && s.charAt(19) == '.') {
        micros(LocalDateTime.parse(s, dateTimeFrac).atZone(zid).toInstant)
      } else if (n == 19) {
        micros(LocalDateTime.parse(s, dateTime).atZone(zid).toInstant)
      } else null
    } catch {
      case _: DateTimeException => null
    }
  }

  private def micros(i: Instant): java.lang.Long =
    java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000L)

  def lenient_timestamp(s: Column): Column =
    GraftColumn.column(LenientTimestamp(GraftColumn.expression(s)))
}
