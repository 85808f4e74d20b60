package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical dedup normalization in ONE byte pass — semantically
  * `trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]', ' '),
  * ' +', ' '))`, the rule the DuckDB oracle runs verbatim. The regex
  * chain costs three full Java-regex passes over the corpus text
  * (measured 14.3 s for dedup_exact_normalized at sf10 — ~30× the
  * un-normalized query); this kernel lowercases, maps every
  * non-[a-z0-9] byte to a token break, collapses breaks, and trims in
  * a single scan with one output buffer.
  *
  * ASCII contract (same as the registered rule): on ASCII input the
  * kernel is bit-identical to the regex chain (ExprSpec pins it). A
  * non-ASCII byte is not in [a-z0-9 ] so both forms erase it — the
  * only divergence is exotic Unicode where `lower()` maps a non-ASCII
  * codepoint INTO a-z (e.g. Kelvin sign → k), which the byte kernel
  * erases instead; the corpora this library's oracles run against are
  * ASCII (the fingerprint oracle asserts it), and the normalization
  * rule is DEFINED as ASCII-canonical.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    NormalizeText.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  def compute(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var k = 0
    var pendingBreak = false
    var i = 0
    while (i < b.length) {
      val raw = b(i) & 0xFF
      val c = if (raw >= 'A' && raw <= 'Z') raw + 32 else raw
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingBreak && k > 0) { out(k) = ' '; k += 1 }
        pendingBreak = false
        out(k) = c.toByte
        k += 1
      } else {
        // space, punctuation, or any non-ASCII byte: a token break —
        // emitted as ONE space iff a kept byte follows (collapse+trim)
        pendingBreak = true
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, k))
  }

  def normalize_text(c: Column): Column =
    GraftColumn.column(NormalizeText(GraftColumn.expression(c)))
}
