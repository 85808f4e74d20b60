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
      key => normalizeNtz(key._1.read.parquet(key._2)))

  /** The driver's generator writes plain `timestamp[us]` parquet columns
    * (isAdjustedToUTC=false), which Spark 4's reader surfaces as
    * TIMESTAMP_NTZ by default. graft Sessions disable
    * `spark.sql.parquet.inferTimestampNTZ.enabled`, so the scan itself
    * surfaces those columns as the session-zoned TIMESTAMP the whole
    * operator surface (unix_micros frames, window ranges, DuckDB-hash
    * parity) is written against — with `session.timeZone=UTC` the values
    * are bit-identical (raw micros = epoch micros), and, unlike the
    * previous cast-after-scan, ts-range predicates sit on a bare
    * attribute and reach parquet row-group stats (PlanSpec pins the
    * pushdown). This method remains as a FALLBACK for externally built
    * sessions without that conf: the cast preserves the same values but
    * blocks row-group pruning on the cast column (the r9 ADVICE trade);
    * under graft Sessions it finds no NTZ fields and is a no-op.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntzCols = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntzCols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The driver's generator has shipped `ts` in two physical forms:
    * TIMESTAMP(NANOS) (rejected by Spark's vectorized reader — sessions
    * set `spark.sql.legacy.parquet.nanosAsLong=true` and the ns long is
    * floor-divided to µs here, matching DuckDB's truncating epoch_us)
    * and, since round 8, plain `timestamp[us]` (surfaced as
    * TIMESTAMP_NTZ and normalized to session-zoned TIMESTAMP by
    * [[load]]). Both paths end at the same µs wall-clock TIMESTAMP
    * column, so event timestamps agree across the oracle boundary.
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

  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  /** On-disk byte size of a table (sum of file lengths) — the free
    * footer-class statistic broadcast GATES use to bound estimated
    * in-memory bytes, not just row counts (r16 advice: a doc-count
    * gate admits arbitrarily wide rows).
    */
  def parquetByteSize(spark: SparkSession, sfDir: String, name: String): Long =
    sizeCache.computeIfAbsent(s"$sfDir/$name.parquet", _ => {
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
      val fs = root.getFileSystem(conf)
      val status = fs.getFileStatus(root)
      if (status.isFile) status.getLen
      else {
        var total = 0L
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.getName.endsWith(".parquet")) total += f.getLen
        }
        total
      }
    })

  /** Change-detection key for on-disk derived stores
    * ([[graft.operators.Ivf]]'s index, [[graft.operators.Dedup]]'s
    * standing dedup store): a 64-bit digest over the table's file
    * LISTING — each file's relative name, size, and mtime — so a
    * regenerated source gets a new stamp even when timestamps are
    * preserved (cp -p, rsync -a, tar extraction defeat a max-mtime-only
    * key whenever the rewrite changes bytes or layout but not times).
    * Unchanged-content rewrites with preserved names+sizes+mtimes still
    * collide, which is the correct fixpoint: identical listing ⇒ the
    * derived store is still valid.
    */
  /** Filesystem-safe unique slug of a source directory for derived-
    * store tmp paths (r14, closes the hashCode-collision nit: two
    * distinct dirs with colliding String.hashCode would share a
    * `_SUCCESS`-guarded tree and race). The canonical path is made
    * injective by keeping its sanitized tail (the discriminating part)
    * plus a hex digest of the full path.
    */
  def pathSlug(dir: String): String = {
    val canon = new java.io.File(dir).getAbsolutePath
    val tail = canon.takeRight(40).map(c =>
      if (c.isLetterOrDigit) c else '_')
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString
    s"${tail}_$digest"
  }

  def sourceStamp(sfDir: String, name: String): Long = {
    val root = java.nio.file.Paths.get(sfDir, s"$name.parquet")
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        var acc = 0L
        val it = s.sorted().iterator()
        while (it.hasNext) {
          val p = it.next()
          acc = acc * 1000003L + root.relativize(p).toString.hashCode
          acc = acc * 1000003L + java.nio.file.Files.getLastModifiedTime(p).toMillis
          if (java.nio.file.Files.isRegularFile(p))
            acc = acc * 1000003L + java.nio.file.Files.size(p)
        }
        acc
      } finally s.close()
    }
  }

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
