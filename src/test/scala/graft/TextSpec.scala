package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val dir = "/root/testdata/sf0.001"

  /** Independent naive reimplementation of the winnowing fingerprint:
    * hash every window from scratch (O(n·w)) instead of rolling — same
    * math, different algorithm, so a rolling-update bug can't hide.
    */
  private def naiveFingerprint(text: String, w: Int): Long = {
    val bytes = text.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val win = math.min(w, bytes.length)
    (0 to bytes.length - win).map { start =>
      var h = 0L
      var i = start
      while (i < start + win) { h = h * graft.functions.RollingHash.Base + (bytes(i) & 0xffL); i += 1 }
      h
    }.min
  }

  test("rolling fingerprint matches the naive O(n*w) reimplementation") {
    val rows = TextAnalysis.fingerprint(spark, dir).limit(100)
      .join(graft.sources.Tables.documents(spark, dir), "doc_id")
      .select("doc_id", "fingerprint", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == naiveFingerprint(r.getString(2), 16),
        s"doc ${r.getLong(0)} fingerprint diverges")
    }
  }

  test("fingerprint is invariant under shared-prefix perturbation semantics") {
    import spark.implicits._
    // Two texts sharing a long run contain shared windows; the min can
    // come from the shared run, while disjoint texts almost never collide.
    val df = Seq(
      ("AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAtail one", 1),
      ("AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAtail two", 2)).toDF("text", "id")
    val fps = df.select(graft.functions.RollingHash.rolling_fingerprint(col("text"), 16)).collect()
    assert(fps(0).getLong(0) == fps(1).getLong(0),
      "near-identical texts should share their minimum window hash")
  }

  test("token counts are consistent") {
    val rows = TextAnalysis.tokens(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) >= r.getLong(1), "BPE-ish tokens can't be fewer than words here")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("quality score stays in [0,1] and ratios are proper fractions") {
    val rows = TextAnalysis.quality(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // stopword_ratio
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // alpha_ratio
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // quality_score
    }
  }

  test("langid prediction is deterministic priority argmax") {
    val rows = TextAnalysis.langid(spark, dir).collect()
    rows.foreach { r =>
      val scores = Seq("en" -> r.getLong(1), "es" -> r.getLong(2),
        "de" -> r.getLong(3), "fr" -> r.getLong(4))
      val best = scores.map(_._2).max
      val expected = if (best == 0) "und" else scores.find(_._2 == best).get._1
      assert(r.getString(5) == expected)
    }
  }
}
