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
  /** ±1 plane component for (table, plane, dim) — the same integer-hash
    * parity formula the declarative path used.
    */
  def planeComponent(t: Int, j: Int, i: Int): Double = {
    val v = ((t * 73856093L + j * 19349663L + i * 83492791L) * 2654435761L) & 0xffffffffL
    if (((v >> 16) & 1L) == 1L) 1.0 else -1.0
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
