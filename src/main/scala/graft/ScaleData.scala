package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a testdata directory: every fact table is
  * replicated `factor` times with key columns shifted by a power-of-ten
  * offset per copy, so referential joins stay intact (copy i of an
  * order joins copy i of its lineitems) and every id remains unique.
  * Dimension tables (region, nation) are copied as-is.
  *
  * Purpose: the sf0.1 sweep mostly measures Spark's fixed per-query
  * planner constant; a 10× corpus separates that constant from real
  * throughput so BASELINE.md's "within small factors of a native
  * engine at the same scale" claim is measured, not extrapolated.
  * Payload columns are PERTURBED per copy — text through a per-copy
  * Caesar rotation of a-z, embeddings by rotating the vector i
  * positions — so copies are not near-duplicates of each other and the
  * dedup/similarity operators measure 10× the *work*, not a 45×
  * explosion of the *output* (verbatim replication makes every doc a
  * 10-way exact-dup group: candidate pairs and result rows then grow
  * quadratically in the factor by construction, which benchmarks the
  * output writer, not the engine). Within-copy structure — planted
  * near-dups, value distributions, word lengths — is preserved.
  *
  * Usage: runMain graft.ScaleData <srcDir> <dstDir> <factor>
  */
object ScaleData {

  /** Power-of-ten offset comfortably above the column's max value. */
  private def offset(df: DataFrame, key: String): Long = {
    val mx = df.agg(max(col(key).cast("long"))).head.getLong(0)
    var off = 10L
    while (off <= mx) off *= 10
    off
  }

  /** Union of `factor` copies with each (column -> offset) shifted by
    * i·offset in copy i. Copy 0 is the original data.
    */
  private def replicate(df: DataFrame, factor: Int, shifts: Map[String, Long]): DataFrame =
    (0 until factor).map { i =>
      shifts.foldLeft(df) { case (d, (k, off)) =>
        d.withColumn(k, col(k) + lit(i * off))
      }
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorS) = args
    val factor = factorS.toInt
    // The text/embedding perturbations cycle at 26 (Caesar rotation) and
    // 64 (vector rotation): copy 26 / copy 64 would be byte-identical to
    // copy 0, silently reintroducing the quadratic exact-duplicate
    // explosion the perturbation exists to prevent. Fail loudly instead.
    require(factor <= 26,
      s"factor $factor exceeds the perturbation period (26): scaled copies would repeat")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables

    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")

    // Dimensions: copy as-is.
    write("region", Tables.region(spark, srcDir))
    write("nation", Tables.nation(spark, srcDir))

    val cust = Tables.customer(spark, srcDir)
    val supp = Tables.supplier(spark, srcDir)
    val part = Tables.part(spark, srcDir)
    val ord  = Tables.orders(spark, srcDir)
    val li   = Tables.lineitem(spark, srcDir)
    val offC = offset(cust, "c_custkey")
    val offS = offset(supp, "s_suppkey")
    val offP = offset(part, "p_partkey")
    val offO = offset(ord, "o_orderkey")
    write("customer", replicate(cust, factor, Map("c_custkey" -> offC)))
    write("supplier", replicate(supp, factor, Map("s_suppkey" -> offS)))
    write("part", replicate(part, factor, Map("p_partkey" -> offP)))
    write("orders", replicate(ord, factor,
      Map("o_orderkey" -> offO, "o_custkey" -> offC)))
    write("lineitem", replicate(li, factor,
      Map("l_orderkey" -> offO, "l_partkey" -> offP, "l_suppkey" -> offS)))

    // events: Tables.events already normalizes ts to a µs timestamp;
    // the scaled copy persists it as a true TIMESTAMP column (DuckDB
    // reads it directly; Tables.events passes it through unchanged).
    val ev = Tables.events(spark, srcDir)
    write("events", replicate(ev, factor,
      Map("event_id" -> offset(ev, "event_id"), "user_id" -> offset(ev, "user_id"))))

    val docs = Tables.documents(spark, srcDir)
    val offD = offset(docs, "doc_id")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    write("documents", (0 until factor).map { i =>
      val rot = alpha.drop(i % 26) + alpha.take(i % 26)
      docs.select((col("doc_id") + lit(i * offD)).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"))
    }.reduce(_ unionByName _))

    val emb = Tables.embeddings(spark, srcDir)
    val offV = offset(emb, "vec_id")
    write("embeddings", (0 until factor).map { i =>
      val r = i % 64
      val rotated =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 64 - r), slice(col("embedding"), 1, r))
      emb.select((col("vec_id") + lit(i * offV)).as("vec_id"), rotated.as("embedding"))
    }.reduce(_ unionByName _))

    spark.stop()
  }
}
