package graft.operators

import graft.functions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator pack (SURVEY §2.1).
  *
  * Each query is a declarative DataFrame plan — Catalyst handles pushdown,
  * pruning and join strategy; AQE handles runtime partition coalescing.
  * Results are deterministically ordered and decimal-exact (see
  * graft.functions) so the driver's DuckDB hash-compare is stable.
  */
object Relational {

  /** Q1-shape: scan→filter→groupBy→multi-agg on the fact table.
    * Partial (map-side) aggregation means the shuffle carries one row per
    * (flag,status) per task — O(groups), not O(rows) — at any scale.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
