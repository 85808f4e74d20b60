package graft.operators

import graft.functions.presentSorted
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates (SURVEY §2.1 sketch rows).
  *
  * At 100 TB an exact COUNT(DISTINCT) is a full shuffle of every
  * distinct value; the sketch versions aggregate constant-size state
  * per partition and merge it — one narrow reduce, no wide shuffle.
  * Composed from Spark's built-ins (HyperLogLog++ and the
  * Greenwald-Khanna quantile sketch) per the brief's preference order:
  * compose existing ops when semantics allow. Accuracy is
  * property-tested against exact answers in SketchSpec (no DuckDB
  * oracle: sketch internals are engine-specific).
  */
object Sketches {

  /** `sketch_distinct`: HLL++ distinct counts per event_type with a 2%
    * target relative error, next to the exact count at test scale.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        approx_count_distinct(col("event_id"), rsd = 0.02).as("approx_events"))
      .transform(presentSorted(_, col("event_type")))

  /** `sketch_quantiles`: Greenwald-Khanna p50/p95/p99 of order value —
    * the cardinality-independent answer to q17's exact median.
    */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("quantiles"))
      .select(col("o_orderstatus"),
        element_at(col("quantiles"), 1).as("p50"),
        element_at(col("quantiles"), 2).as("p95"),
        element_at(col("quantiles"), 3).as("p99"))
      .transform(presentSorted(_, col("o_orderstatus")))
}
