package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact fixed-point SUM of a double measure on a two-long (128-bit)
  * accumulator — the hot path behind [[graft.functions.dsum]].
  *
  * The straightforward order-independent sum (`sum(cast(x as
  * decimal(18,4)))`) is exact but slow at scale: Spark widens the
  * aggregation buffer to decimal(28,4), which no longer fits a compact
  * long, so every row pays BigDecimal allocations in both the input
  * cast and the buffer add — measured as ~80% of q1_agg at sf10
  * (4.8 s vs 0.9 s for the same plan with double sums). This aggregate
  * does what a vectorized engine does for decimal SUM (DuckDB
  * accumulates into a 128-bit hugeint): scale the input to an integer
  * once, then accumulate in two primitive longs with carry — zero
  * allocation per row, whole-stage-codegen-friendly (every step is a
  * static Java call, the same pattern as [[HashedShingles]]), and
  * overflow-safe to ±2^127 scaled units, far past any 100 TB sum.
  *
  * Semantics match `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` on
  * any input with at most `scale` decimal digits whose scaled value
  * fits a long (|x| < 9.2·10^14 at scale 4; the money/metric measures
  * this library sums are ≤ 10^6 with ≤ 4 decimals): there the
  * round-half-away-from-zero of x·10^s is exactly the decimal cast's
  * rounding, the accumulation is exact integer math, and the final
  * 128-bit value converts through one BigDecimal per GROUP (not per
  * row). Inputs with MORE decimal digits can differ from the decimal
  * cast by one 10^-scale unit on halfway cases — see [[toScaled]]'s
  * note before registering sum_scaled over such data. Repo usage is
  * hash-verified against the DuckDB oracle at
  * sf0.01 and A/B-verified equal to the decimal path on the sf0.1 and
  * sf10 bench tables for every registered dsum query.
  *
  * SQL null semantics are preserved: null inputs are skipped and an
  * empty (or all-null) group yields NULL, via the `nonEmpty` buffer
  * flag. All arithmetic lives in static methods, so Spark 4's default
  * ANSI mode cannot throw on the intentional low-word wraparound.
  */
case class SumScaled(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sum_scaled"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double child (cast first), got ${child.dataType.simpleString}")
    else if (scale < 0 || scale > 9)
      TypeCheckResult.TypeCheckFailure(s"$prettyName scale must be in [0, 9], got $scale")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val hi = AttributeReference("sumHi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("sumLo", LongType, nullable = false)()
  private lazy val nonEmpty = AttributeReference("nonEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, nonEmpty)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = ScaledLong(child, scale)
    Seq(
      If(IsNull(child), hi, Add128HiUpdate(hi, lo, x)),
      If(IsNull(child), lo, Add128Lo(lo, x)),
      Or(nonEmpty, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add128HiMerge(hi.left, lo.left, hi.right, lo.right),
    Add128Lo(lo.left, lo.right),
    Or(nonEmpty.left, nonEmpty.right))

  override lazy val evaluateExpression: Expression =
    If(nonEmpty, Scaled128ToDouble(hi, lo, scale), Literal(null, DoubleType))

  override protected def withNewChildInternal(newChild: Expression): SumScaled =
    copy(child = newChild)
}

object SumScaled {
  /** round-half-away-from-zero of v·10^scale as one primitive op.
    * NOTE a subtle divergence from `cast(double as decimal(p,s))`: the
    * cast rounds the double's SHORTEST DECIMAL representation
    * (BigDecimal.valueOf + HALF_UP), while this rounds the BINARY
    * product v·10^s — on inputs with more than `scale` decimal digits
    * whose (scale+1)-th digit makes a halfway case (e.g. 90992.50475
    * at scale 4: binary product 909925047.4999999 → …047, decimal path
    * → …048) the two can differ by one ulp of the scaled unit. All
    * repo measures carry ≤ `scale` decimal digits, where the paths are
    * bit-identical (ExprSpec).
    */
  def toScaled(v: Double, scale: Int): Long = {
    val scaled = v * POW10(scale)
    if (scaled >= 0) Math.round(scaled) else -Math.round(-scaled)
  }
  private val POW10: Array[Double] =
    (0 to 9).map(i => math.pow(10, i)).toArray

  /** low word of a 128-bit add: plain wrapping long add. */
  def addLo(a: Long, b: Long): Long = a + b

  /** unsigned carry-out of a + b (0 or 1). */
  private def carry(a: Long, b: Long): Long = {
    val s = a + b
    ((a & b) | ((a | b) & ~s)) >>> 63
  }

  /** high word after adding signed x into (hi, lo): sign-extend x and
    * propagate the low-word carry.
    */
  def addHiUpdate(hi: Long, lo: Long, x: Long): Long =
    hi + (x >> 63) + carry(lo, x)

  /** high word after adding 128-bit (hiB, loB) into (hiA, loA). */
  def addHiMerge(hiA: Long, loA: Long, hiB: Long, loB: Long): Long =
    hiA + hiB + carry(loA, loB)

  /** exact (hi·2^64 + lo) / 10^scale as the nearest double — one
    * BigDecimal per group, identical to Decimal.toDouble on the
    * decimal-sum path.
    */
  def toDouble(hi: Long, lo: Long, scale: Int): Double = {
    val loBytes = java.nio.ByteBuffer.allocate(8).putLong(lo).array()
    val unscaled = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(1, loBytes))
    new java.math.BigDecimal(unscaled, scale).doubleValue()
  }

  /** `dsum`-shaped entry point: exact order-independent sum at the
    * given decimal scale, double out.
    */
  def sum_scaled(c: Column, scale: Int): Column =
    GraftColumn.column(AggregateExpression(
      SumScaled(GraftColumn.expression(c), scale), Complete, isDistinct = false))
}

/** scaled fixed-point value of a double (see [[SumScaled.toScaled]]). */
case class ScaledLong(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "scaled_long"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    SumScaled.toScaled(v.asInstanceOf[Double], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SumScaled.toScaled($c, $scale)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** wrapping low-word add of the 128-bit accumulator. */
case class Add128Lo(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "add128_lo"
  override def nullSafeEval(a: Any, b: Any): Any =
    SumScaled.addLo(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SumScaled.addLo($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** high word after folding a signed scaled input into the accumulator. */
case class Add128HiUpdate(hi: Expression, lo: Expression, x: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "add128_hi_update"
  override def first: Expression = hi
  override def second: Expression = lo
  override def third: Expression = x
  override def nullSafeEval(h: Any, l: Any, v: Any): Any =
    SumScaled.addHiUpdate(h.asInstanceOf[Long], l.asInstanceOf[Long], v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l, v) => s"graft.functions.SumScaled.addHiUpdate($h, $l, $v)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(hi = f, lo = s, x = t)
}

/** high word of merging two 128-bit partial accumulators. */
case class Add128HiMerge(hiA: Expression, loA: Expression,
                         hiB: Expression, loB: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "add128_hi_merge"
  override def first: Expression = hiA
  override def second: Expression = loA
  override def third: Expression = hiB
  override def fourth: Expression = loB
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SumScaled.addHiMerge(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.functions.SumScaled.addHiMerge($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression, q: Expression): Expression =
    copy(hiA = f, loA = s, hiB = t, loB = q)
}

/** exact 128-bit scaled value → nearest double (one call per group). */
case class Scaled128ToDouble(hi: Expression, lo: Expression, scale: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "scaled128_to_double"
  override def left: Expression = hi
  override def right: Expression = lo
  override def nullSafeEval(h: Any, l: Any): Any =
    SumScaled.toDouble(h.asInstanceOf[Long], l.asInstanceOf[Long], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l) => s"graft.functions.SumScaled.toDouble($h, $l, $scale)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(hi = l, lo = r)
}
