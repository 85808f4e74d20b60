package graft

import graft.functions.TopKPairs.top_k_pairs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + distribution gates for the primitive bounded top-k
  * aggregate ([[graft.functions.TopKPairs]]) the kNN self-join rides:
  * best-first output under (score DESC, id ASC), agreement with a
  * sort-based reference on random data, and invariance under partition
  * count (partial heaps must merge associatively).
  */
class TopKPairsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)

  test("keeps the k best pairs, emitted best-first with ascending-id ties") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 7.0, 12L),
      (1L, 9.0, 9L), (1L, 1.0, 13L), (2L, 3.0, 1L))
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(top_k_pairs(col("score"), col("id"), 3).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.score"), col("t.id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0, 9.0, 9L), (1L, 1, 9.0, 11L), (1L, 2, 7.0, 12L),
      (2L, 0, 3.0, 1L)), s"got ${out.toSeq}")
  }

  test("matches the sort-based reference on random data at every partition count") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(40).toLong, math.floor(rnd.nextDouble() * 50) / 10.0, i.toLong)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (s, id) => (-s, id) }.take(7)
    }
    for (parts <- Seq(1, 3, 32)) {
      val got = rows.toDF("g", "score", "id").repartition(parts)
        .groupBy(col("g"))
        .agg(top_k_pairs(col("score"), col("id"), 7).as("t"))
        .select(col("g"), explode(col("t")).as("t"))
        .select(col("g"), col("t.score"), col("t.id"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (g, rs) => g -> rs.map(r => (r.getDouble(1), r.getLong(2))).toSeq }
      assert(got.keySet == expected.keySet)
      for ((g, exp) <- expected)
        assert(got(g) == exp, s"parts=$parts group=$g: ${got(g)} vs $exp")
    }
  }

  test("expression children (generic eval path) match bound-attribute children (primitive path)") {
    // The planner binds plain attribute inputs to BoundReferences (the
    // zero-boxing fast path); computed children like score+0.0 keep an
    // expression tree and take the generic eval branch. Both must agree.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 2000).map { i =>
      (rnd.nextInt(20).toLong, math.floor(rnd.nextDouble() * 30) / 10.0 - 1.5, i.toLong)
    }.toDF("g", "score", "id").repartition(5)
    def run(scoreCol: org.apache.spark.sql.Column, idCol: org.apache.spark.sql.Column) =
      df.groupBy(col("g"))
        .agg(top_k_pairs(scoreCol, idCol, 4).as("t"))
        .select(col("g"), col("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getDouble(0), p.getLong(1)))).toMap
    val fast = run(col("score"), col("id"))
    val generic = run(col("score") + lit(0.0), col("id") + lit(0L))
    assert(fast == generic, s"paths diverge: $fast vs $generic")
  }

  test("buffer serialization round-trips the heap contents") {
    val buf = new graft.functions.TopKPairsBuf(5)
    val rnd = new scala.util.Random(3)
    val agg = graft.functions.TopKPairs(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = true), 5)
    (0 until 200).foreach(i => buf.insert(math.floor(rnd.nextDouble() * 20) / 4.0, i.toLong))
    val back = agg.deserialize(agg.serialize(buf))
    def pairs(b: graft.functions.TopKPairsBuf) =
      (0 until b.size).map(i => (b.scores(i), b.ids(i))).sortBy { case (s, id) => (-s, id) }
    assert(back.size == buf.size)
    assert(pairs(back) == pairs(buf), s"${pairs(back)} vs ${pairs(buf)}")
  }

  test("groups smaller than k return all their pairs; null scores are skipped") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0), 5L), (1L, None, 6L), (2L, Some(1.0), 7L))
      .toDF("g", "score", "id")
    val got = df.groupBy(col("g"))
      .agg(top_k_pairs(col("score"), col("id"), 10).as("t"))
      .select(col("g"), size(col("t")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 1, 2L -> 1), s"got $got")
  }

  test("k=1 with negated id/score reproduces max(struct)/min(struct) including ties") {
    // The r18 SortAggregate fix replaces max(struct(score, id)) /
    // min(struct(score, id)) decorations (struct buffers are not
    // hash-aggregable) with top_k_pairs k=1 under sign flips. Pin the
    // tie-break parity on crafted ties: max(struct) breaks ties to the
    // LARGEST id, min(struct) to the SMALLEST — top_k_pairs is
    // (score DESC, id ASC), so id = −id models the former and
    // score = −score the latter.
    import spark.implicits._
    val df = Seq((1L, 9.0, 11L), (1L, 9.0, 9L), (1L, 7.0, 20L),
      (2L, 3.0, 1L), (2L, 3.0, 4L), (2L, 5.0, 2L))
      .toDF("g", "score", "id")
    val viaStruct = df.groupBy(col("g"))
      .agg(max(struct(col("score"), col("id"))).as("mx"),
        min(struct(col("score"), col("id"))).as("mn"))
      .select(col("g"), col("mx.score"), col("mx.id"), col("mn.score"), col("mn.id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(_._1).toSeq
    val viaTk = df.groupBy(col("g"))
      .agg(top_k_pairs(col("score"), -col("id"), 1).as("mx"),
        top_k_pairs(-col("score"), col("id"), 1).as("mn"))
      .select(col("g"),
        col("mx")(0).getField("score"), -col("mx")(0).getField("id"),
        -col("mn")(0).getField("score"), col("mn")(0).getField("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(viaTk == viaStruct, s"$viaTk vs $viaStruct")
  }
}
