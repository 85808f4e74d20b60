package graft

import graft.operators.Sketches
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  test("HLL distinct counts are within the configured relative error") {
    val approx = Sketches.approxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"), countDistinct(col("event_id")).as("e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, (u, e)) =>
      // rsd=0.02 → generous 4-sigma-ish bound of 8%
      assert(math.abs(approx(k)._1 - u) <= math.max(2, 0.08 * u), s"$k users")
      assert(math.abs(approx(k)._2 - e) <= math.max(2, 0.08 * e), s"$k events")
    }
  }

  test("GK quantiles bracket the exact percentile ranks") {
    val approx = Sketches.approxQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { case (k, sorted) =>
      Seq(0.5, 0.95, 0.99).zip(approx(k)).foreach { case (p, got) =>
        // the approx value's true rank must lie near p (GK guarantee)
        val rank = sorted.count(_ <= got).toDouble / sorted.length
        assert(math.abs(rank - p) <= 0.05, s"$k p$p: value $got has rank $rank")
      }
    }
  }

  test("quantile ordering is monotone (p50 <= p95 <= p99)") {
    Sketches.approxQuantiles(spark, dir).collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }
}
