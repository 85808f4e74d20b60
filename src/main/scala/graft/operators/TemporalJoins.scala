package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (builder brief: "as-of
  * join, range join"), composed from shuffle-safe primitives — no
  * custom physical operator needed and no nested-loop join anywhere.
  */
object TemporalJoins {

  /** Backward as-of join via the union+window trick: tag both sides,
    * union, sort per key by (ts, tiebreak), and carry the latest
    * right-side row forward with `last(..., ignoreNulls)` over an
    * unbounded-preceding frame. ONE shuffle on the key — the naive
    * formulation (θ-join on `r.ts <= l.ts` + argmax) plans as a
    * BroadcastNestedLoopJoin that is quadratic at scale.
    *
    * Returns the left rows with `asof_<c>` columns for each requested
    * right-side value column (null when no right row precedes).
    * Ordering within equal timestamps follows (ts, tiebreak) with
    * right-side rows sorting before left at full ties, so a right row
    * at exactly `l.ts` with a smaller tiebreak id matches.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   ts: String, tiebreak: String,
                   rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .select(keys.map(col) ++ Seq(col(ts).as("__ts"), col(tiebreak).as("__tb"), col("__side")) ++
        leftCols.filterNot(c => keys.contains(c)).map(c => col(c).as(s"__l_$c")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col(ts).as("__ts"), col(tiebreak).as("__tb"), col("__side")) ++
        leftCols.filterNot(c => keys.contains(c)).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select((keys.map(col) :+ col("__ts") :+ col("__tb") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c")) ++
        rightVals.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    carried
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(ts), col("__tb").as(tiebreak)) ++
        leftCols.filterNot(c => keys.contains(c) || c == ts || c == tiebreak)
          .map(c => col(s"__l_$c").as(c)) ++
        rightVals.map(c => col(s"asof_$c")): _*)
  }

  /** `asof_attribution`: each click attributed to the user's most
    * recent view at or before the click's timestamp (ties on ts
    * resolved to the highest view event_id) — the reference's
    * ads↔conversion linkage done the way an event-attribution pipeline
    * needs it at scale.
    */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    // Both sides come from the same table, so the generic two-table
    // union path would scan events twice; tagging sides in one
    // filtered scan is the same plan shape minus a scan and a union.
    val tagged = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", 1).otherwise(0).as("__side"),
        when(col("event_type") === "view", col("event_id")).as("__view_id"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("__side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("attributed_view", last(col("__view_id"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("event_id"), col("user_id"), col("attributed_view"))
      .orderBy(col("event_id"))
  }

  /** Bucketed range join: join points to intervals (`lo <= x < hi`)
    * by exploding each interval into fixed-width buckets and
    * equi-joining on (key, bucket) before the exact range filter. The
    * naive θ-join is a nested loop; this shuffles on (key, bucket), so
    * cost tracks interval width / bucket width instead of |L|·|R|.
    */
  def rangeJoinBucketed(points: DataFrame, pointCol: Column,
                        intervals: DataFrame, loCol: Column, hiCol: Column,
                        keys: Seq[String], bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", (pointCol.cast("long") / bucketWidth).cast("long"))
    val iv = intervals
      .withColumn("__lo_b", (loCol.cast("long") / bucketWidth).cast("long"))
      .withColumn("__hi_b", (hiCol.cast("long") / bucketWidth).cast("long"))
      .withColumn("__bucket", explode(expr("sequence(__lo_b, __hi_b)")))
      .drop("__lo_b", "__hi_b")
    p.join(iv, keys :+ "__bucket")
      .filter(pointCol >= loCol && pointCol < hiCol)
      .drop("__bucket")
  }

  /** `range_session_events`: q18's sessions re-joined to their member
    * events through the bucketed range join — every event must land
    * back in exactly the session whose [start, end+1µs) window holds
    * it. Session boundaries use the same µs-precision >30 min gap as
    * q18; the spec checks membership against an independent
    * collect-and-scan reimplementation.
    */
  def rangeSessionEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    val flagged = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1)
          .otherwise(0).as("new_session"))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = flagged.groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("lo"),
        (max(unix_micros(col("ts"))) + 1L).as("hi"))
    rangeJoinBucketed(ev, col("ts_us"), sessions, col("lo"), col("hi"),
      Seq("user_id"), bucketWidth = 3600L * 1000000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
