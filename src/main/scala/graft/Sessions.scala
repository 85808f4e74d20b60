package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by tests and mains.
  *
  * Settings chosen for the driver's local[N] harness but shaped for a
  * real cluster: AQE on (runtime coalesce + skew-join splitting), UTC
  * session time zone (oracle parity), shuffle partitions sized to the
  * active core count rather than the 200 default.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Start wide, let AQE coalesce down: a fixed partition count equal
      // to the core count makes every big shuffle a handful of giant
      // sort-and-spill tasks once the data outgrows it (the sf10 sweep
      // measured dedup_ngram_jaccard at 271 s with 8 fixed partitions,
      // 134 s with AQE coalescing from 64). Small queries still coalesce
      // to one or two partitions, so the constant stays amortized.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(cores * 4, 32).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
