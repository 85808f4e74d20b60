package graft

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming twins must agree with their batch twins on the
  * same finite feed (SURVEY §2.7). The feed streams through a file
  * source (public API, one micro-batch) into a memory sink.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  test("streaming hourly window agg equals q13_hourly_agg batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_hourly").toString
    val events = Tables.events(spark, dir)
    events.write.mode("overwrite").parquet(tmp)
    val src = spark.readStream.schema(events.schema).parquet(tmp)
    val q = EventStream.hourlyAgg(src).writeStream
      .format("memory").queryName("hourly_stream").outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val got = spark.table("hourly_stream").collect().map(key).sortBy(t => (t._1, t._2))
    val want = Relational.q13HourlyAgg(spark, dir).collect().map(key).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("streaming sessionize equals q18_sessionize batch") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Ev]
    // A flush sentinel per user far past the feed's horizon closes every
    // open session (the finite-feed stand-in for event-time timeout).
    val maxTs = ev.toDF().agg(max(col("ts"))).head.getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 36000000L)
    val flush = ev.map(_.user_id).distinct().collect().toSeq
      .map(u => EventStream.Ev(-1L, flushTs, u, "flush", 0.0))
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_sess").toString
    ev.union(flush.toDS()).write.mode("overwrite").parquet(tmp)
    val src = spark.readStream.schema(ev.schema).parquet(tmp).as[EventStream.Ev]
    val q = EventStream.sessionize(src).writeStream
      .format("memory").queryName("sess_stream").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))
    val got = spark.table("sess_stream").collect().map(key).sortBy(t => (t._1, t._2))
    val want = Relational.q18Sessionize(spark, dir).collect().map(key).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }
}
