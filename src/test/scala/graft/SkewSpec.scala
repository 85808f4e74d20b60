package graft

import graft.functions.dsum
import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  test("salted two-phase aggregation equals the direct groupBy bit-for-bit") {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"),
        max(col("value")).as("mx"))
    val salted = Skew.saltedAgg(ev, Seq(col("event_type")), buckets = 8,
      partials = Seq(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).as("total_d"),
        max(col("value")).as("mx")),
      merges = Seq(sum(col("n")).as("n"), sum(col("total_d")).cast("double").as("total"),
        max(col("mx")).as("mx")))
    assert(salted.count() == direct.count())
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("phase-1 spreads a hot key across salts (no single-reducer key)") {
    import spark.implicits._
    // one pathological key with 10k rows + a cold key
    val hot = (1 to 10000).map(i => ("hot", i.toDouble)) ++ Seq(("cold", 1.0))
    val df = hot.toDF("k", "v")
    val phase1Groups = df.withColumn("__salt",
        pmod(hash(df.columns.map(col): _*), lit(8)))
      .groupBy(col("k"), col("__salt")).count()
      .filter(col("k") === "hot")
    val n = phase1Groups.count()
    assert(n >= 4, s"hot key only split into $n sub-groups")
    // no sub-group carries more than half the hot rows
    assert(phase1Groups.agg(max(col("count"))).head.getLong(0) <= 6000)
  }
}
