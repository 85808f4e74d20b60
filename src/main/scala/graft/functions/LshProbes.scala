package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Query-directed multiprobe bucket sequence (Lv et al., VLDB'07) for
  * the same hyperplane family as [[LshBuckets]]: per hash table, the
  * `probes` buckets most likely to hold a near neighbor — the exact
  * bucket plus the lowest-cost bit-flip perturbations, where a flip's
  * cost is the query's margin |projection| on that plane (a plane the
  * query barely cleared is the plane a neighbor most likely lands on
  * the other side of). Flip sets are enumerated to size ≤ 3, scored by
  * summed margin, and the `probes` cheapest kept.
  *
  * Output encodes (table, bucket) as one long — (t << 32) | bucket —
  * so the caller can explode and split with plain column arithmetic
  * instead of a struct array.
  *
  * Intended for the QUERY side of an ANN join (tiny: probe generation
  * is O(tables·bits²·log) per row and the output fans out
  * tables·probes rows per query). The data side keeps the single
  * exact bucket from [[LshBuckets]] — multiprobe on one side only,
  * so the big side's explode factor stays `tables` regardless of
  * probe depth.
  */
case class LshProbes(child: Expression, tables: Int, bits: Int, probes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_probes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if tables > 0 && bits > 0 && bits <= 30 && probes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, tables > 0, 0 < bits <= 30, probes > 0, " +
        s"got ${t.simpleString}")
  }

  override def nullSafeEval(emb: Any): Any =
    LshProbes.compute(emb.asInstanceOf[ArrayData], tables, bits, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshProbes.compute($c, $tables, $bits, $probes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshProbes {

  /** Size of the ≤3-flip probe family over `bits` planes — the cap on
    * effective probes per table. Callers use it to estimate candidate
    * volume before choosing the bucket-join or dense path.
    */
  def probeFamilySize(bits: Int): Int =
    1 + bits + bits * (bits - 1) / 2 + bits * (bits - 1) * (bits - 2) / 6

  /** Static entry point shared by the interpreted and codegen paths.
    * Mirrors [[LshBuckets.compute]]'s projection arithmetic exactly
    * (ascending-index left-fold into a double), so the zero-flip probe
    * is always the bucket LshBuckets assigns.
    */
  def compute(emb: ArrayData, tables: Int, bits: Int, probes: Int): ArrayData = {
    val dims = emb.numElements()
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) { x(i) = emb.getFloat(i).toDouble; i += 1 }
    // flip sets of size <= 3 over `bits` planes, scored by summed margin
    val nSets = 1 + bits + bits * (bits - 1) / 2 + bits * (bits - 1) * (bits - 2) / 6
    val take = math.min(probes, nSets)
    val out = new Array[Long](tables * take)
    val score = new Array[Double](nSets)
    val mask = new Array[Int](nSets)
    val margin = new Array[Double](bits)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        var acc = 0.0
        i = 0
        while (i < dims) { acc += x(i) * LshBuckets.planeComponent(t, j, i); i += 1 }
        bucket = bucket * 2 + (if (acc > 0) 1 else 0)
        // bit j sits at position bits-1-j of the bucket id
        margin(bits - 1 - j) = math.abs(acc)
        j += 1
      }
      var n = 0
      score(n) = 0.0; mask(n) = 0; n += 1
      var a = 0
      while (a < bits) {
        score(n) = margin(a); mask(n) = 1 << a; n += 1
        var b = a + 1
        while (b < bits) {
          score(n) = margin(a) + margin(b); mask(n) = (1 << a) | (1 << b); n += 1
          var c = b + 1
          while (c < bits) {
            score(n) = margin(a) + margin(b) + margin(c)
            mask(n) = (1 << a) | (1 << b) | (1 << c); n += 1
            c += 1
          }
          b += 1
        }
        a += 1
      }
      // partial selection of the `take` cheapest flip sets (n <= 4526 at bits=30)
      val idx = Array.range(0, n).sortBy(k => (score(k), mask(k)))
      var k = 0
      while (k < take) {
        out(t * take + k) = (t.toLong << 32) | ((bucket ^ mask(idx(k))) & 0xffffffffL)
        k += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  def lsh_probes(emb: Column, tables: Int, bits: Int, probes: Int): Column =
    GraftColumn.column(LshProbes(GraftColumn.expression(emb), tables, bits, probes))
}
