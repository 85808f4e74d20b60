package graft.streaming

import graft.functions.dsum
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Structured Streaming twins of the batch event operators (SURVEY
  * §2.7). Both run identically on `readStream` sources at cluster
  * scale; the specs drive them through MemoryStream and assert equality
  * with their batch twins (q13_hourly_agg, q18_sessionize).
  */
object EventStream {

  /** One event row; `ts` carries event time. */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)

  /** Open-session state carried between micro-batches per user. Money
    * accumulates as scale-4 BigDecimal so the emitted session_value is
    * bit-identical to the batch path's DECIMAL(18,4) sum.
    */
  case class SessionState(startUs: Long, lastUs: Long, n: Long,
                          sum: BigDecimal, idx: Long)

  /** Closed session, schema-identical to q18_sessionize's output. */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        session_start: String, session_value: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000 // 30 min, matches q18

  /** Event time in epoch µs. Timestamp.getTime truncates to ms; the
    * batch twin (q18) compares gaps at µs precision, so reconstruct the
    * µs value from the nanos field to keep the twins bit-identical.
    */
  private def tsUs(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming twin of q13_hourly_agg: event-time tumbling window agg.
    * With a real unbounded source this runs append-mode with the
    * 2-hour watermark bounding state; the spec uses complete mode so
    * every window is observable at assertion time.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  private def usToStr(us: Long): String =
    fmt.format(Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  /** Streaming twin of q18_sessionize: gap-based session windows via
    * flatMapGroupsWithState. A session closes when a later event for
    * the same user arrives more than 30 min after the last one; an
    * `event_type == "flush"` sentinel closes whatever is open (the
    * spec's substitute for event-time timeout on a finite feed — a
    * production source would use GroupStateTimeout.EventTimeTimeout
    * with the same transition function).
    *
    * Within a micro-batch events are buffered and sorted by (ts,
    * event_id) — the same total order the batch twin's window uses —
    * so replays in arrival order or as one big batch agree.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = Seq.newBuilder[SessionOut]
          var cur: Option[SessionState] = state.getOption
          def close(s: SessionState): Unit =
            out += SessionOut(uid, s.idx, s.n, usToStr(s.startUs), s.sum.toDouble)
          it.toSeq.sortBy(e => (tsUs(e.ts), e.event_id)).foreach { e =>
            val us = tsUs(e.ts)
            if (e.event_type == "flush") {
              cur.foreach(close)
              cur = cur.map(s => s.copy(startUs = us, lastUs = us, n = 0,
                sum = BigDecimal(0), idx = s.idx + 1))
              // n == 0 marks "no real events yet"; a flush-only state
              // never emits.
            } else {
              val v = BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              cur match {
                case Some(s) if s.n > 0 && us - s.lastUs <= GapUs =>
                  cur = Some(s.copy(lastUs = us, n = s.n + 1, sum = s.sum + v))
                case Some(s) =>
                  if (s.n > 0) close(s)
                  cur = Some(SessionState(us, us, 1, v, s.idx + (if (s.n > 0) 1 else 0)))
                case None =>
                  cur = Some(SessionState(us, us, 1, v, 1))
              }
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          out.result().iterator
      }
  }
}
