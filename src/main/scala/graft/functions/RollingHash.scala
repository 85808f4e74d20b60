package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style rolling polynomial document fingerprint
  * (Schleimer/Wilkerson/Aiken 2003, "local algorithms for document
  * fingerprinting").
  *
  * A degree-(W-1) polynomial hash is rolled across the UTF-8 bytes in
  * O(1) per step (subtract the outgoing byte's B^(W-1) term, multiply by
  * B, add the incoming byte); the fingerprint is the minimum window hash
  * — shared byte runs of ≥ W produce shared window hashes, so
  * near-identical documents frequently share fingerprints while the
  * value stays a single long per row. Documents shorter than W hash as
  * one window over all bytes.
  *
  * One pass, no shuffle, whole-stage-codegen'd via a static call — same
  * pattern as [[HmacSha256]].
  */
case class RollingHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string and window > 0, got ${t.simpleString}, window=$window")
  }

  override def nullSafeEval(s: Any): Any =
    RollingHash.compute(s.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Base = 1000003L // prime base; arithmetic mod 2^64 (long overflow)

  /** Static entry point shared by the interpreted and codegen paths. */
  def compute(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) for the O(1) roll-out of the departing byte.
    var pow = 1L
    var i = 1
    while (i < w) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xffL) * pow) * Base + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def rolling_fingerprint(text: Column, window: Int = 16): Column =
    GraftColumn.column(RollingHash(GraftColumn.expression(text), window))
}
