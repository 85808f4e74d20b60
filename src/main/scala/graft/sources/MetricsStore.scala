package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Date-partitioned metrics storage — the reference's own scale answer
  * (SYSTEM_DESIGN.md: partition by date/channel) realized as a parquet
  * layout Spark prunes natively.
  *
  * Writing `partitionBy("date")` turns every date-ranged query
  * (filter_since, channel, funnel, export) into a directory prune: the
  * scan lists only matching `date=...` directories instead of reading
  * 100 TB and filtering. The channel sub-partition is deliberately NOT
  * used — channel cardinality is tiny (≤ a few dozen) and a
  * date×channel matrix would fragment files below HDFS block size at
  * daily volume; channel stays a pushed row-group filter instead.
  */
object MetricsStore {

  /** Persist consolidated metrics partitioned by date. Overwrite is
    * idempotent per the reference's re-ingest contract: same input,
    * same partitions, same rows.
    *
    * Rows are clustered on the partition column before the write:
    * without it every upstream task holds rows for every date, so a
    * w-task write into d dates sprays w×d near-empty files (5k+ at
    * sf0.1 — the file-listing cost then dominates the serve path's
    * prune). Clustered, each date lands wholly in one task → d files
    * total. A date whose volume exceeds one task's comfort (possible at
    * 100 TB: consolidated rows per date are bounded by the key-domain
    * cross product, so only pathological domains get there) would use an
    * AQE REBALANCE hint instead, which splits oversized partitions while
    * keeping small dates coalesced.
    */
  def write(metrics: DataFrame, path: String): Unit =
    metrics.repartition(org.apache.spark.sql.functions.col("date"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("date")
      .parquet(path)

  /** Read back; date filters become partition pruning (verified by
    * PlanSpec — the scan's `PartitionFilters` must carry them).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
