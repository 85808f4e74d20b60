package graft

import graft.functions.TopKBy
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact semantics of the CollectTopK bridge: which end of the
  * ordering the bounded heap keeps, and the order of the emitted array
  * — the two facts knnSelfJoin's rank mapping depends on.
  */
class TopKBySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(2)

  test("collect_top_k keeps the k largest under the ordering, emitted descending") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 7.0, 12L),
      (1L, 9.0, 9L), (1L, 1.0, 13L))
      .toDF("g", "score", "id")
    // best-by-score with ascending id tiebreak: ordering (score, -id),
    // largest first → (9.0, 9), (9.0, 11), (7.0, 12) at positions 0..2
    val out = df.groupBy(col("g"))
      .agg(TopKBy.collect_top_k(struct(col("score"), (-col("id")).as("n")), 3).as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "t")))
      .select(col("pos"), col("t.score"), (-col("t.n")).as("id"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0, 9.0, 9L), (1, 9.0, 11L), (2, 7.0, 12L)),
      s"got ${out.toSeq}")
  }
}
