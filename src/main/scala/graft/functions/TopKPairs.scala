package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Primitive-array bounded top-k state for [[TopKPairs]]: a k-element
  * binary min-heap on (score ASC, id DESC), so the root is always the
  * WORST pair kept and the common-case update against a full heap is a
  * single primitive compare-and-reject. No boxing, no per-element
  * objects — two flat arrays per group.
  *
  * "Better" = higher score, ties to the SMALLER id — the
  * (score DESC, id ASC) ordering every top-k consumer in the repo uses.
  */
final class TopKPairsBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // a strictly worse than b under (score DESC, id ASC) goodness
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var c = size
      scores(c) = s; ids(c) = id; size += 1
      // sift up: a child worse than its parent bubbles toward the root
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) {
          val ts = scores(c); scores(c) = scores(p); scores(p) = ts
          val ti = ids(c); ids(c) = ids(p); ids(p) = ti
          c = p
        } else return
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      // candidate beats the worst kept pair: replace root, sift down
      scores(0) = s; ids(0) = id
      var p = 0
      while (true) {
        val l = 2 * p + 1
        if (l >= size) return
        val r = l + 1
        var w = l // worst child
        if (r < size && worse(scores(r), ids(r), scores(l), ids(l))) w = r
        if (worse(scores(w), ids(w), scores(p), ids(p))) {
          val ts = scores(p); scores(p) = scores(w); scores(w) = ts
          val ti = ids(p); ids(p) = ids(w); ids(w) = ti
          p = w
        } else return
      }
    }
  }
}

/** Bounded top-k over (score: double, id: long) pairs — the
  * primitive-specialized twin of Spark's `CollectTopK`, built for
  * candidate streams in the billions where the generic collector's
  * per-row cost (InternalRow copy + boxed BoundedPriorityQueue insert
  * under an interpreted ordering) dominates the whole aggregate.
  * Measured on the kNN self-join's sf10 candidate stream (~5·10^9
  * pairs): see BASELINE.md's sim_knn_join section.
  *
  * Semantics: keeps the k pairs with the LARGEST score (ties to the
  * smallest id) per group; returns `array<struct<score:double,
  * id:bigint>>` sorted best-first, so array position = rank − 1. An
  * empty group yields an empty array. Null score or id skips the row.
  *
  * Scale shape is identical to CollectTopK: partial states are
  * k-bounded heaps merged map-side, each map task forwards ≤ k pairs
  * per group it saw, nothing is globally sorted, and shuffle volume is
  * bounded by (groups-per-task)·k regardless of candidate count.
  *
  * The update path avoids boxing entirely when the children are bound
  * attribute references (the planner binds aggregate inputs to the
  * child operator's output schema, so after a Project computes the
  * score this is the only shape that occurs): it reads the primitives
  * straight off the InternalRow by ordinal. The generic eval path
  * exists for completeness and for literal/expression children.
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuf] with BinaryLike[Expression] {

  require(k >= 1, s"top_k_pairs: k must be positive, got $k")

  private val pairType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint), got (${l.simpleString}, ${r.simpleString})")
  }

  override def createAggregationBuffer(): TopKPairsBuf = new TopKPairsBuf(k)

  // Bound-ordinal fast path: resolved once per task, -1 = generic eval.
  @transient private lazy val scoreOrd: Int = left match {
    case b: BoundReference => b.ordinal
    case _ => -1
  }
  @transient private lazy val idOrd: Int = right match {
    case b: BoundReference => b.ordinal
    case _ => -1
  }

  override def update(buf: TopKPairsBuf, input: InternalRow): TopKPairsBuf = {
    if (scoreOrd >= 0 && idOrd >= 0) {
      if (!input.isNullAt(scoreOrd) && !input.isNullAt(idOrd))
        buf.insert(input.getDouble(scoreOrd), input.getLong(idOrd))
    } else {
      val s = left.eval(input)
      val i = right.eval(input)
      if (s != null && i != null)
        buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKPairsBuf, other: TopKPairsBuf): TopKPairsBuf = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKPairsBuf): Any = {
    // heap order -> best-first: sort indices by (score DESC, id ASC)
    val n = buf.size
    val idx = Array.range(0, n)
    val sorted = idx.sortWith { (a, b) =>
      buf.scores(a) > buf.scores(b) ||
        (buf.scores(a) == buf.scores(b) && buf.ids(a) < buf.ids(b))
    }
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = InternalRow(buf.scores(sorted(i)), buf.ids(sorted(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKPairsBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  /** Top-k (score, id) pairs per group, best-first (score DESC, id ASC).
    * Returns `array<struct<score:double, id:bigint>>`.
    */
  def top_k_pairs(score: Column, id: Column, k: Int): Column =
    GraftColumn.column(AggregateExpression(
      TopKPairs(GraftColumn.expression(score), GraftColumn.expression(id), k),
      Complete, isDistinct = false))
}
