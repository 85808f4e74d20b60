package graft

import graft.operators.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  test("meta and features agree on payload sizes") {
    val meta = Multimodal.meta(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = Multimodal.features(spark, dir).collect()
    assert(feats.length == meta.size)
    feats.foreach { r =>
      assert(meta(r.getLong(0)) == r.getLong(10))
    }
  }

  test("meta chunk counts equal the chunks operator's actual fan-out") {
    val metaRows = Multimodal.meta(spark, dir).collect()
    val chunkRows = Multimodal.chunks(spark, dir).collect().groupBy(_.getLong(0))
    val declared = metaRows.map(r => r.getLong(0) -> r.getLong(4)).toMap
    // empty payloads legitimately have zero chunk rows — read them as 0,
    // not a missing key
    val actual = declared.keys.map(id =>
      id -> chunkRows.get(id).map(_.length.toLong).getOrElse(0L)).toMap
    assert(declared == actual)
    // and chunk bytes re-assemble to the full payload size (ASCII corpus)
    val sizes = metaRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reassembled = declared.keys.map(id =>
      id -> chunkRows.get(id).map(_.map(_.getLong(2)).sum).getOrElse(0L)).toMap
    assert(reassembled == sizes)
  }

  test("fake decode features are normalized and deterministic") {
    val run1 = Multimodal.features(spark, dir).collect()
    val run2 = Multimodal.features(spark, dir).collect()
    run1.zip(run2).foreach { case (a, b) => assert(a == b) }
    run1.foreach { r =>
      val hist = (1 to 8).map(r.getDouble)
      assert(math.abs(hist.sum - 1.0) < 1e-9, "histogram must be a distribution")
      assert(r.getDouble(9) > 0.0 && r.getDouble(9) < 256.0)
    }
  }
}
