package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query, timed end-to-end at
  * SPARK_GRAFT_SF_DIR, one JSON line out.
  *
  * Each query materializes through the `noop` sink — a real write of
  * every row and column through the whole plan (unlike `count()`, which
  * lets Catalyst elide sorts/projections/limits), with zero disk cost
  * so the number measured is the engine, not the filesystem.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(cpus.toInt * 4, 32).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One tiny warmup materialization so JVM/codegen startup cost isn't
    // charged to the first query in the map.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // Optional comma-separated subset (e.g. the sf10 dedup-family point
    // in BASELINE.md) — unset runs the full registered map. A name that
    // matches no registered query is a hard error: a typo would otherwise
    // run zero queries and emit an empty result that looks like success.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    subset.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_QUERIES names not registered: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = subset.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter { case (k, _) => s(k) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators persist() shared intermediates; release them so one
      // query's cache can't skew the next timing or accumulate all sweep
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
