package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HMAC-SHA256 hex signature as a native Catalyst expression (reference:
  * internal/api/handlers.go generateHMACSignature — the export sink signs
  * each payload with hex(hmac-sha256(body, secret))).
  *
  * Implemented as an Expression rather than a UDF so it participates in
  * whole-stage codegen: `doGenCode` emits a direct static call, no
  * serialization or row boxing on the hot path.
  */
case class HmacSha256(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def prettyName: String = "hmac_sha256"

  override def nullSafeEval(data: Any, key: Any): Any =
    HmacSha256.hmacHex(data.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k) => s"graft.functions.HmacSha256.hmacHex($d, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HmacSha256 {
  private val HEX = "0123456789abcdef".toCharArray

  /** Static entry point shared by the interpreted and codegen paths. */
  def hmacHex(data: UTF8String, key: UTF8String): UTF8String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes, "HmacSHA256"))
    val raw = mac.doFinal(data.getBytes)
    val out = new Array[Char](raw.length * 2)
    var i = 0
    while (i < raw.length) {
      out(i * 2) = HEX((raw(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(raw(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  def hmac_sha256(data: Column, key: Column): Column = {
    import org.apache.spark.sql.classic.ExpressionUtils
    ExpressionUtils.column(HmacSha256(
      ExpressionUtils.expression(data), ExpressionUtils.expression(key)))
  }
}
