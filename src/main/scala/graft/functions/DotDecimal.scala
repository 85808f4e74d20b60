package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Decimal-exact dot product of two float vectors, one codegen'd call.
  *
  * Semantically identical to the declarative form
  * `aggregate(zip_with(a, b, (x,y) -> cast(xd*yd as decimal(30,12))),
  * 0.00..0, (acc,v) -> acc+v) :: double` — each product rounds to scale
  * 12 exactly like Spark's double→decimal cast (BigDecimal.valueOf +
  * HALF_UP, the same value DuckDB produces), and the scale-12 sum is
  * exact, so results stay bit-identical to the DuckDB oracle.
  *
  * Exists because higher-order functions evaluate interpreted: the
  * lambda chain allocates a zipped array plus per-element lambda frames;
  * this is one loop with a single running BigDecimal. Measured roughly
  * at parity with the declarative form at sf0.1 (the BigDecimal
  * rounding both versions share dominates) but it keeps the projection
  * inside whole-stage codegen and halves the expression tree.
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
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  def dot_decimal(a: Column, b: Column): Column =
    GraftColumn.column(DotDecimal(
      GraftColumn.expression(a), GraftColumn.expression(b)))
}
