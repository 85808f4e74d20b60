package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables.
  *
  * Each table is a single parquet file under an sf directory. Reads are
  * plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning
  * freedom; at cluster scale the same call reads a date-partitioned
  * directory tree and gains partition pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One schema-inference + file-listing per (session, path) instead of one
  // per registered query: a 59-query sweep re-resolved the same ten footers
  // hundreds of times. A DataFrame is an immutable plan, so reuse is safe;
  // the testdata directories never mutate within a JVM.
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    dfCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the ns long is
    * floor-divided (integral DIV — a double round-trip would lose
    * precision at 1e18) to µs here. DuckDB's epoch_us truncates the same
    * way, so event timestamps agree across the oracle boundary.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    // Scaled-up copies (graft.ScaleData) write ts as a true µs
    // timestamp; only the driver's original nanos-long column needs
    // the DIV-1000 conversion.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exact row count from parquet footer metadata — no data scan, no
    * Spark job. Operators that size themselves to n (adaptive LSH bucket
    * widths) must not pay a full `count()` action for it: at 100 TB that
    * is an extra pass over the table, while footers are a few KB per
    * file. Driver-side file listing is O(#files); a cluster deployment
    * with millions of files would take n from catalog statistics
    * instead, but the sizing only needs log2(n) so even a stale count
    * is fine.
    */
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  def parquetRowCount(spark: SparkSession, sfDir: String, name: String): Long =
    countCache.computeIfAbsent(s"$sfDir/$name.parquet",
      _ => parquetRowCountUncached(spark, sfDir, name))

  private def parquetRowCountUncached(
      spark: SparkSession, sfDir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = root.getFileSystem(conf)
    def footerCount(f: org.apache.hadoop.fs.FileStatus): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getRecordCount finally reader.close()
    }
    val status = fs.getFileStatus(root)
    if (status.isFile) footerCount(status)
    else {
      var total = 0L
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) total += footerCount(f)
      }
      total
    }
  }
}
