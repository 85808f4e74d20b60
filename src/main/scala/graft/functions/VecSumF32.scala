package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise SUM of an `array<float>` column → `array<double>` — the
  * centroid-recompute aggregate behind [[graft.operators.Ivf]]'s
  * distributed Lloyd iterations.
  *
  * The declarative twin (posexplode → groupBy(key, pos) → sum →
  * re-assemble) shuffles dim rows per input row — a 64× blow-up of the
  * training sample through two exchanges. This aggregate keeps the
  * whole vector sum in one buffer per group: one map-side pass, one
  * (group → 64-element partial) shuffle row per partition.
  *
  * DETERMINISM: accumulation is FIXED-POINT — each float scales to a
  * long at 2^32 (exact: a float's value times 2^32 rounds identically
  * no matter what was summed before it) and partials add in long
  * arithmetic, which is associative and commutative. Centroids are
  * therefore bit-identical run-to-run regardless of partition count or
  * merge order, where a double accumulator would wobble at 1 ulp with
  * the merge schedule and make cell assignment of near-equidistant
  * vectors (and thus downstream ANN results) nondeterministic.
  * Headroom: |x| ≤ 2^20 scales to ≤ 2^52; 2^10 such rows per group
  * stay clear of 2^63 — embedding coordinates are O(1), training
  * groups ≤ 64·nlist rows, so overflow is ~2^30 away in practice.
  *
  * Null semantics: null vectors are skipped; an all-null (or empty)
  * group yields NULL. Mixed lengths take the max length, absent tails
  * treated as zero (training data is fixed-dim; the rule exists so the
  * aggregate is total).
  */
case class VecSumF32(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Scale = 4294967296.0 // 2^32

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_f32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buffer.length >= n) buffer else java.util.Arrays.copyOf(buffer, n)
      var i = 0
      while (i < n) {
        b(i) += Math.round(arr.getFloat(i).toDouble * Scale)
        i += 1
      }
      b
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) buffer
    else if (buffer.length == 0) other
    else {
      val (big, small) = if (buffer.length >= other.length) (buffer, other) else (other, buffer)
      var i = 0
      while (i < small.length) { big(i) += small(i); i += 1 }
      big
    }
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null
    else {
      val out = new Array[Double](buffer.length)
      var i = 0
      while (i < buffer.length) { out(i) = buffer(i) / Scale; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumF32 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumF32 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecSumF32 {
  def vec_sum_f32(v: Column): Column =
    GraftColumn.column(AggregateExpression(
      VecSumF32(GraftColumn.expression(v)), Complete, isDistinct = false))
}
