package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
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
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(data: Any, key: Any): Any =
    HmacSha256.hmacHex(data.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k) => s"graft.functions.HmacSha256.hmacHex($d, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HmacSha256 {
  private val HEX = "0123456789abcdef".toCharArray

  /** Per-thread Mac keyed by the secret bytes: `Mac.getInstance` +
    * `init` per row would dominate the hot path (provider lookup + key
    * schedule); the export key is a constant, so each executor thread
    * initializes exactly once.
    */
  private val macCache = new ThreadLocal[(Array[Byte], javax.crypto.Mac)]

  private def macFor(key: Array[Byte]): javax.crypto.Mac = {
    val cached = macCache.get()
    if (cached != null && java.util.Arrays.equals(cached._1, key)) cached._2
    else {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      macCache.set((key.clone(), mac))
      mac
    }
  }

  /** Static entry point shared by the interpreted and codegen paths. */
  def hmacHex(data: UTF8String, key: UTF8String): UTF8String = {
    val mac = macFor(key.getBytes)
    val raw = mac.doFinal(data.getBytes)
    val out = new Array[Byte](raw.length * 2)
    var i = 0
    while (i < raw.length) {
      out(i * 2) = HEX((raw(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = HEX(raw(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def hmac_sha256(data: Column, key: Column): Column =
    GraftColumn.column(HmacSha256(
      GraftColumn.expression(data), GraftColumn.expression(key)))
}
