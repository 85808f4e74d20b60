package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket ids for `tables` hash tables of `bits`
  * sign bits each, in one codegen'd pass over the embedding.
  *
  * Bit j of table t is the sign of the projection onto a deterministic
  * ±1 plane (integer-hash parity — no RNG, stable across runs and
  * engines). Replaces a transform/aggregate/zip_with nest that
  * evaluated interpreted with per-element lambda frames; the arithmetic
  * (ascending-index left-fold of x·p into a double) is identical, so
  * bucket assignments are unchanged.
  */
case class LshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if tables > 0 && bits > 0 && bits <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, tables > 0, 0 < bits <= 30, got ${t.simpleString}")
  }

  override def nullSafeEval(emb: Any): Any =
    LshBuckets.compute(emb.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBuckets.compute($c, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  /** ±1 plane component for (table, plane, dim) — integer-hash parity,
    * no RNG, stable across runs and engines.
    *
    * r9: the original single-multiply hash (`(t·P1+j·P2+i·P3)·M`, bit
    * 16) was quasi-PERIODIC in the dimension index: per i-increment the
    * product advances by a constant whose bit-16 rotation number is
    * ≈0.299, so every (t, j) plane was a phase shift of one period-7
    * ±1 pattern — measured mean pairwise |dot| 32/64 across a 16×14
    * family (random planes: ~6.4), with some pairs IDENTICAL. The
    * "independent tables" of every LSH operator were one direction in
    * disguise, which capped ANN bucket-path recall at ~0.66–0.89
    * regardless of probes/tables (a 0.90-cosine planted neighbor
    * measured 4–10 flips per table against an expected 2). splitmix64's
    * full avalanche de-correlates the family: same key, mean |dot|
    * ~6.5, recall restored (BASELINE.md r9 ANN section).
    */
  def planeComponent(t: Int, j: Int, i: Int): Double = {
    var h = t.toLong * 0x9E3779B97F4A7C15L +
      j.toLong * 0xC2B2AE3D27D4EB4FL + i.toLong * 0x165667B19E3779F9L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^= h >>> 31
    if ((h & 1L) == 1L) 1.0 else -1.0
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Array[Double]]]]()

  private def planes(tables: Int, bits: Int, dims: Int): Array[Array[Array[Double]]] =
    planeCache.computeIfAbsent((tables, bits, dims), _ =>
      Array.tabulate(tables, bits, dims)(planeComponent))

  /** Static entry point shared by the interpreted and codegen paths. */
  def compute(emb: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dims = emb.numElements()
    val pl = planes(tables, bits, dims)
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) { x(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val p = pl(t)(j)
        var acc = 0.0
        i = 0
        while (i < dims) { acc += x(i) * p(i); i += 1 }
        bucket = bucket * 2 + (if (acc > 0) 1 else 0)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def lsh_buckets(emb: Column, tables: Int, bits: Int): Column =
    GraftColumn.column(LshBuckets(GraftColumn.expression(emb), tables, bits))
}
