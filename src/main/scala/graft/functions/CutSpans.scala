package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rebuild a document's text with flagged word spans CUT — the
  * consumer of [[graft.operators.Dedup.substringSpans]]'s removal list
  * (Lee et al. 2021 span dedup: the cleaned corpus is the product, the
  * span list only the audit). `spans` arrive as two parallel long
  * arrays of [start, end] word offsets, SORTED and DISJOINT (maximal
  * islands are disjoint by construction); the kernel merge-scans words
  * against spans in O(tokens + spans) — the declarative alternative
  * (`filter(w, (x, i) -> !exists(spans, …))`) is O(tokens · spans)
  * interpreted lambda evaluation per row.
  */
case class CutSpans(words: Expression, starts: Expression, ends: Expression)
    extends TernaryExpression {
  override def first: Expression = words
  override def second: Expression = starts
  override def third: Expression = ends
  override def dataType: DataType = StringType
  override def prettyName: String = "cut_spans"

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, starts.dataType, ends.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>, array<bigint>), got $t")
    }

  override def nullSafeEval(w: Any, s: Any, e: Any): Any =
    CutSpans.compute(w.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s, e) => s"graft.functions.CutSpans.compute($w, $s, $e)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(words = newFirst, starts = newSecond, ends = newThird)
}

object CutSpans {
  def compute(words: ArrayData, starts: ArrayData, ends: ArrayData): UTF8String = {
    val m = words.numElements()
    val ns = starts.numElements()
    val kept = new Array[UTF8String](m)
    var k = 0
    var si = 0
    var i = 0
    while (i < m) {
      while (si < ns && ends.getLong(si) < i) si += 1
      val covered = si < ns && starts.getLong(si) <= i && i <= ends.getLong(si)
      if (!covered) {
        kept(k) = if (words.isNullAt(i)) UTF8String.EMPTY_UTF8 else words.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      java.util.Arrays.copyOf(kept, k): _*)
  }

  def cut_spans(words: Column, starts: Column, ends: Column): Column =
    GraftColumn.column(CutSpans(GraftColumn.expression(words),
      GraftColumn.expression(starts), GraftColumn.expression(ends)))
}
