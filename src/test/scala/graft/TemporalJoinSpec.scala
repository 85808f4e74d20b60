package graft

import graft.operators.TemporalJoins
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward join picks the latest preceding right row (with tie rules)") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "c1"),
      (2L, 10L, ts("2024-01-01 12:00:00"), "c2"),
      (3L, 10L, ts("2024-01-01 09:00:00"), "c-before-any"),
      (4L, 20L, ts("2024-01-01 10:00:00"), "other-user"))
      .toDF("event_id", "user_id", "ts", "tag")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), "v-early"),
      (101L, 10L, ts("2024-01-01 10:00:00"), "v-tied"), // ties with click 1: eligible
      (102L, 10L, ts("2024-01-01 11:00:00"), "v-mid"))
      .toDF("event_id", "user_id", "ts", "label")
    val out = TemporalJoins.asofBackward(left, right, Seq("user_id"), "ts", "event_id",
      Seq("label")).collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("asof_label")).toMap
    assert(out(1L) == "v-tied")        // tie at 10:00 → view eligible, highest id wins
    assert(out(2L) == "v-mid")         // latest preceding
    assert(out(3L) == null)            // nothing precedes
    assert(out(4L) == null)            // other user's views invisible
  }

  test("asof attribution matches a brute-force per-user scan") {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("s"),
        col("ts"), col("event_type")).collect()
    val byUser = ev.groupBy(_.getLong(1))
    def us(r: org.apache.spark.sql.Row) = {
      val t = r.getTimestamp(3); (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    }
    val expected = byUser.iterator.flatMap { case (_, rows) =>
      val views = rows.filter(_.getString(4) == "view").map(r => (us(r), r.getLong(0)))
      rows.filter(_.getString(4) == "click").iterator.map { c =>
        val eligible = views.filter { case (vt, _) => vt <= us(c) }
        c.getLong(0) -> (if (eligible.isEmpty) None else Some(eligible.maxBy(v => (v._1, v._2))._2))
      }
    }.toMap
    val got = TemporalJoins.asofAttribution(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    val diffs = expected.filter { case (k, v) => got(k) != v }
    assert(diffs.isEmpty, s"attribution mismatches: ${diffs.take(5)}")
  }

  test("bucketed range join honors [lo, hi) including bucket-crossing intervals") {
    import spark.implicits._
    val points = Seq((1L, 0L), (1L, 999L), (1L, 1000L), (1L, 5000L), (2L, 500L))
      .toDF("k", "x")
    val intervals = Seq((1L, 0L, 1000L, "a"), (1L, 900L, 5001L, "b"), (2L, 600L, 700L, "c"))
      .toDF("k", "lo", "hi", "iv")
    val got = TemporalJoins.rangeJoinBucketed(points, col("x"), intervals,
      col("lo"), col("hi"), Seq("k"), bucketWidth = 256L)
      .select(col("k"), col("x"), col("iv")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 0L, "a"), (1L, 999L, "a"),   // inside [0,1000)
      (1L, 999L, "b"), (1L, 1000L, "b"), (1L, 5000L, "b"))) // 1000 excluded from a; 5000 < 5001
  }

  test("range-joined session membership equals an independent gap scan") {
    val got = TemporalJoins.rangeSessionEvents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var sid = 0L
      var last = Long.MinValue
      val counts = scala.collection.mutable.Map[Long, Long]()
      sorted.foreach { case (_, us, _) =>
        if (last == Long.MinValue || us - last > 1800L * 1000000L) sid += 1
        counts(sid) = counts.getOrElse(sid, 0L) + 1
        last = us
      }
      counts.map { case (k, v) => (u, k) -> v }
    }.toMap
    assert(got == expected && got.nonEmpty)
  }
}
