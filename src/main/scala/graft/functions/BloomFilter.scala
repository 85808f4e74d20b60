package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Distributed Bloom filter over 64-bit keys — the bounded-size
  * semi-join pushdown (SURVEY §5): when one side of a join only exists
  * to restrict the other ("keep train postings whose shingle occurs in
  * some TEST doc"), an exact broadcast of the restricting key set stops
  * scaling first — a hash-set of 64-bit keys costs ~30 B/key on the
  * heap of EVERY executor. A Bloom filter at `BitsPerKey`=12 costs
  * 1.5 B/key for a ~0.4% false-positive rate, buying ~20× more keys per
  * broadcast byte; false positives only let extra probe-side rows
  * through to the exact join that follows, so results are unchanged by
  * construction and the filter is purely a volume knob.
  *
  * Build is one aggregation job: partitions OR their local bit arrays
  * into one buffer (partial aggregation — the shuffle carries one
  * filter per map task, never keys), and the driver holds the single
  * finished filter — bounded state sized by the BUILD-side key count,
  * the same class as [[IvfCells]]' centroid matrix, shipped to
  * executors as one codegen reference object inside [[BloomContains]].
  *
  * Hashing is double hashing over two splitmix64 streams of the input
  * key (Kirsch–Mitzenmacher: bit_i = h1 + i·h2, h2 forced odd) — fully
  * deterministic, no RNG state, identical across Spark versions and
  * partitionings (ExprSpec pins build-side partitioning invariance
  * bit-for-bit).
  */
object BloomFilters {

  /** Default sizing: 12 bits/key with k=6 probes → FP ≈ (1−e^(−k/12))^k
    * ≈ 0.4% at capacity, conservative below it.
    */
  val BitsPerKey = 12
  val NumProbes = 6

  /** Filter size in BITS for an expected key count (an upper bound is
    * fine — oversizing only lowers the FP rate), rounded up to a whole
    * number of 64-bit words. Capped at 2^33 bits (1 GiB serialized):
    * beyond ~715M keys the FP rate degrades instead of failing, which
    * for a pushdown filter is the correct failure mode (more probe rows
    * pass; results unchanged). The cap must keep the SERIALIZED byte
    * size under Int.MaxValue — at 2^34 bits the byte length is 2^31,
    * which both overflows `Int` in serialize and exceeds the JVM's max
    * array size, so the fail-soft claim would break exactly at the cap
    * (BloomSpec pins the arithmetic).
    */
  val MaxBits: Long = 1L << 33

  def sizeBitsFor(nKeys: Long, bitsPerKey: Int = BitsPerKey): Long =
    math.min(MaxBits, math.max(64L, ((nKeys * bitsPerKey + 63) / 64) * 64))

  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static kernels shared by the interpreted and codegen paths. */
  def setBits(bits: Array[Long], key: Long, k: Int): Unit = {
    val nBits = bits.length.toLong * 64
    val h1 = mix(key)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val b = java.lang.Long.remainderUnsigned(h, nBits)
      bits((b >>> 6).toInt) |= 1L << (b & 63)
      h += h2
      i += 1
    }
  }

  def contains(bits: Array[Long], key: Long, k: Int): Boolean = {
    val nBits = bits.length.toLong * 64
    val h1 = mix(key)
    val h2 = mix(key ^ 0xc2b2ae3d27d4eb4fL) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val b = java.lang.Long.remainderUnsigned(h, nBits)
      if ((bits((b >>> 6).toInt) & (1L << (b & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  def bloom_agg(key: Column, numBits: Long, k: Int = NumProbes): Column =
    GraftColumn.column(AggregateExpression(
      BloomAgg(GraftColumn.expression(key), numBits, k), Complete, isDistinct = false))

  def bloom_contains(key: Column, bits: Array[Long], k: Int = NumProbes): Column =
    GraftColumn.column(BloomContains(GraftColumn.expression(key), bits, k))

  /** Build a filter over `keys` (a one-column frame of longs) sized for
    * `expectedKeys`. ONE aggregation job; the returned array is the
    * bounded driver-side state the probe-side expression ships back out
    * as a reference object.
    */
  def build(keys: DataFrame, key: Column, expectedKeys: Long,
            bitsPerKey: Int = BitsPerKey, k: Int = NumProbes): Array[Long] = {
    val bytes = keys.select(bloom_agg(key, sizeBitsFor(expectedKeys, bitsPerKey), k))
      .head().getAs[Array[Byte]](0)
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** Bloom-filter build aggregate: buffer = the bit array; update sets k
  * bits per key, merge ORs word-wise (associative + commutative, so the
  * result is bit-identical under any partitioning/merge order), eval
  * serializes to binary. Null keys are skipped (a null restricting key
  * matches nothing in an equi-join anyway).
  */
case class BloomAgg(child: Expression, numBits: Long, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if numBits >= 64 && numBits % 64 == 0 &&
        numBits <= BloomFilters.MaxBits && k > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long key, 64 <= numBits <= 2^33 divisible by 64, " +
        s"k > 0; got ${t.simpleString}, numBits=$numBits, k=$k")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits / 64).toInt)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilters.setBits(buffer, v.asInstanceOf[Long], k)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Probe-side membership test. The bit array rides inside the
  * expression as a codegen reference object (the [[IvfCells]] pattern)
  * — evaluation is a map-side, shuffle-free k-probe bit test fused into
  * whole-stage codegen; no join ever materializes for the pushdown.
  */
case class BloomContains(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if bits.nonEmpty && k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long key and a non-empty filter; got ${t.simpleString}")
  }

  override def nullSafeEval(key: Any): Any =
    BloomFilters.contains(bits, key.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomFilters.contains($arr, $c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // contents-compare the array (case-class equality on Array is
  // reference equality, which breaks plan canonicalization — the
  // IvfCells lesson)
  override def equals(other: Any): Boolean = other match {
    case o: BloomContains =>
      o.child == child && o.k == k && java.util.Arrays.equals(o.bits, bits)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(bits)))
}
