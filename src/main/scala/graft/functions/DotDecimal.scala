package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Decimal-exact dot product of two float vectors, one codegen'd call —
  * each product quantized to scale 12 with EXACTLY the oracle's
  * double→DECIMAL(30,12) cast semantics, then summed exactly.
  *
  * The cast semantics matter to the last bit. DuckDB casts double to
  * decimal as `nearbyint(x · 10^scale)` — one double multiply, then
  * round-half-EVEN on the binary result. That is NOT the same as
  * rounding the decimal string (Java `BigDecimal.valueOf` + HALF_UP),
  * and the two disagree on real data: the r11 sim_knn_exact oracle
  * caught product 0.0297976582285000013… (shortest repr …6582285),
  * where HALF_UP-on-string gives …229 but DuckDB's
  * `nearbyint(p·1e12)` lands on the exact half 29797658228.5 and
  * rounds to even → …228. This kernel therefore mirrors DuckDB
  * verbatim: `Math.rint(p · 1e12)` (rint IS round-half-even)
  * accumulated in a scaled long — the sum is exact, `toDouble / 1e12`
  * is one correctly-rounded conversion, bit-identical to DuckDB
  * summing DECIMAL(30,12) in int128 and casting to DOUBLE. (Verified
  * against DuckDB's cast on 20k random products incl. the boundary
  * case; Spark's own double→decimal cast follows the string-HALF_UP
  * convention, so the declarative `cast(x*y as decimal(30,12))` form
  * can differ from the oracle by 1e-12 per boundary product — another
  * reason this expression exists.)
  *
  * Domain bound from the scaled-long representation: |product| must
  * stay below 2^63/1e12 ≈ 9.2·10^6 per element and |dot| below
  * 2^53/1e12 ≈ 9·10^3 for the final conversion to stay exact — four
  * orders of magnitude beyond anything a cosine kernel over unit-ish
  * embeddings produces.
  *
  * Also why it is fast: higher-order functions evaluate interpreted
  * (zipped array + per-element lambda frames), and the BigDecimal
  * variant this replaced allocated per element; this is one fused loop
  * of primitive multiply/rint/add inside whole-stage codegen.
  */
case class DotDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_decimal"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotDecimal.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotDecimal.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotDecimal {
  /** Static entry point shared by the interpreted and codegen paths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      // DuckDB's double->DECIMAL(30,12) cast, verbatim: one double
      // multiply by 10^12, round-half-even on the binary result.
      acc += Math.rint(p * 1e12).toLong
      i += 1
    }
    acc.toDouble / 1e12
  }

  def dot_decimal(a: Column, b: Column): Column =
    GraftColumn.column(DotDecimal(
      GraftColumn.expression(a), GraftColumn.expression(b)))
}
