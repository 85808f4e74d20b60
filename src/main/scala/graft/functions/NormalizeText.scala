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

/** UTF-8-aware tier of [[NormalizeText]] (r15, closing the documented
  * Kelvin-sign-class divergence): NFC canonical normalization →
  * per-codepoint SIMPLE lowercase (Character.toLowerCase(int) — the
  * utf8proc-class mapping DuckDB's lower() applies, not the locale
  * full mapping) → keep Unicode letters (\p{L}) and decimal digits
  * (\p{Nd}); anything else is a token break, breaks collapse to one
  * space, output is trimmed. The DuckDB mirror is exactly
  * `trim(regexp_replace(lower(nfc_normalize(s)), '[^\p{L}\p{Nd}]+',
  * ' ', 'g'))`, so the rule stays oracle-expressible.
  *
  * ALL-ASCII rows (checked in one byte scan) take the [[NormalizeText]]
  * byte kernel verbatim — on ASCII the two rules coincide (NFC is the
  * identity, simple lower is ASCII lower, \p{L}\p{Nd} is [a-z0-9]), so
  * the fast path is bit-identical and an ASCII corpus pays zero cost
  * for the tier (ExprSpec pins both claims). Non-ASCII rows pay one
  * NFC pass + one codepoint scan — still O(chars), no regex engine.
  */
case class NormalizeTextUtf8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text_utf8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    NormalizeTextUtf8.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeTextUtf8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeTextUtf8 {
  def compute(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < b.length) {
      if ((b(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return NormalizeText.compute(s)
    val n = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(n.length)
    var pendingBreak = false
    var j = 0
    while (j < n.length) {
      val cp = n.codePointAt(j)
      val lc = Character.toLowerCase(cp)
      if (Character.isLetter(lc) || Character.isDigit(lc)) {
        if (pendingBreak && sb.length > 0) sb.append(' ')
        pendingBreak = false
        sb.appendCodePoint(lc)
      } else pendingBreak = true
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def normalize_text_utf8(c: Column): Column =
    GraftColumn.column(NormalizeTextUtf8(GraftColumn.expression(c)))
}
