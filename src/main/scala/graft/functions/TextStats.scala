package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-row text statistics in ONE codegen'd pass over the UTF-8
  * bytes: whitespace token count, space count, [a-z] char count, BPE-ish
  * regex token count, stopword count, and the four language-marker
  * scores.
  *
  * Replaces the declarative pile the text pack used to evaluate per row
  * (~20 `size(filter(split(text), λ))` / regexp trees — Spark evaluates
  * higher-order-function lambdas INTERPRETED, re-splitting the text for
  * each of them). Semantics are pinned to the originals, which the
  * DuckDB oracles encode:
  *   - tokens = regex-split on a single space, trailing empties kept
  *     (`split(text, ' ')`): n_tokens = count(' ') + 1.
  *   - n_bpe = matches of `[a-z]+|[0-9]+|[^a-z0-9 ]` — letter runs,
  *     digit runs, anything else one match per CHARACTER (continuation
  *     bytes of a multi-byte char don't count; its lead byte does).
  *   - marker/stopword counts: tokens byte-equal to a list word.
  *
  * Byte-wise scanning is exact on any UTF-8 input: the bytes of ' ',
  * [a-z], [0-9] never occur inside a multi-byte sequence.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.Schema
  override def prettyName: String = "text_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(text: Any): Any =
    TextStats.stats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  /** Stopword list for the quality score (English function words). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Per-language marker words for the heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  val Schema: StructType = StructType(
    (Seq("n_tokens", "n_space", "n_alpha", "n_bpe", "n_stop") ++
      LangMarkers.map { case (lang, _) => s"s_$lang" })
      .map(StructField(_, IntegerType, nullable = false)))

  private val StopBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes("UTF-8")).toArray
  private val MarkerBytes: Array[Array[Array[Byte]]] =
    LangMarkers.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray

  private def tokenIn(b: Array[Byte], s: Int, e: Int, list: Array[Array[Byte]]): Boolean = {
    var k = 0
    while (k < list.length) {
      val w = list(k)
      if (e - s == w.length) {
        var j = 0
        while (j < w.length && b(s + j) == w(j)) j += 1
        if (j == w.length) return true
      }
      k += 1
    }
    false
  }

  /** Static entry point shared by the interpreted and codegen paths. */
  def stats(text: UTF8String): InternalRow = {
    val b = text.getBytes
    var nSpace, nAlpha, nBpe, nStop = 0
    val sLang = new Array[Int](MarkerBytes.length)
    // prev char class for run detection: 0 = other/none, 1 = [a-z], 2 = [0-9]
    var prev = 0
    var tokStart = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        if (tokenIn(b, tokStart, i, StopBytes)) nStop += 1
        var l = 0
        while (l < MarkerBytes.length) {
          if (tokenIn(b, tokStart, i, MarkerBytes(l))) sLang(l) += 1
          l += 1
        }
        tokStart = i + 1
        if (i < b.length) nSpace += 1
        prev = 0
      } else {
        val c = b(i)
        if (c >= 'a' && c <= 'z') { nAlpha += 1; if (prev != 1) nBpe += 1; prev = 1 }
        else if (c >= '0' && c <= '9') { if (prev != 2) nBpe += 1; prev = 2 }
        else if ((c & 0xC0) != 0x80) { nBpe += 1; prev = 0 }
        // else: UTF-8 continuation byte — part of the char its lead byte counted
      }
      i += 1
    }
    val out = new Array[Any](5 + sLang.length)
    out(0) = nSpace + 1 // split(text, ' ') keeps trailing empties: tokens = spaces + 1
    out(1) = nSpace
    out(2) = nAlpha
    out(3) = nBpe
    out(4) = nStop
    var l = 0
    while (l < sLang.length) { out(5 + l) = sLang(l); l += 1 }
    new GenericInternalRow(out)
  }

  def text_stats(c: Column): Column =
    GraftColumn.column(TextStats(GraftColumn.expression(c)))
}
