package graft

/** Scratch A/B harness (not part of the driver contract): times each
  * query in SPARK_GRAFT_QUERIES with AQE on vs off in ONE JVM — the
  * only protocol that survives this host's cross-process noise — using
  * Bench's noop-sink materialization.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val spark = Sessions.driver(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, dir)
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "etl_consolidate")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(4)
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    for (name <- names; aqe <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        Caches.release()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $name aqe=$aqe best ${ts.min}%.3f  " +
        ts.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
