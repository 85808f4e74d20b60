package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `w`-word window hashes of a word array in ONE pass — the
  * O(tokens) kernel behind span-level dedup ([[graft.operators.Dedup
  * .substringSpans]], reference crisXD96/admira-etl-project-prueba has
  * no span operator; the algorithm class is Lee et al. 2021).
  *
  * The declarative form it replaces —
  * `transform(sequence(0, size(w)-W), i ->
  *   xxhash64(array_join(slice(w, i+1, W), ' ')))` —
  * materializes every window as a STRING before hashing: at w=16
  * that is ~16× the corpus's character volume in transient
  * UTF8String allocations per scan, all interpreted (higher-order
  * functions don't codegen). Here each token is XXH64-hashed once,
  * then a Karp–Rabin polynomial roll combines the w token hashes per
  * window in O(1) per step:
  *
  *   H_i = Σ_{j=0..w-1} t_{i+j} · B^{w-1-j}   (mod 2^64)
  *   H_{i+1} = (H_i − t_i · B^{w-1}) · B + t_{i+w}
  *
  * B is odd, so B^k is invertible mod 2^64 and two windows collide only
  * when their token-hash difference polynomial vanishes — probability
  * ≈ 2^-64 per pair over XXH64 token values, the same negligible-
  * collision argument as [[HashedShingles]] (and the DuckDB oracle
  * groups the window STRINGS, so the surrogate is CHECKED each round,
  * not assumed). The hash VALUES differ from the array_join form —
  * every consumer uses them only as window identity, which both forms
  * provide; ExprSpec pins that the downstream spans are identical.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and w > 0, got ${t.simpleString}")
  }

  override def nullSafeEval(words: Any): Any =
    WindowHashes.compute(words.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowHashes.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashes {
  /** Odd (hence invertible mod 2^64) multiplier — 2^64/φ, the same
    * constant family as Spark's hash seeds; any odd constant with good
    * bit diffusion works, the token hashes carry the entropy.
    */
  val Base = 0x9E3779B97F4A7C15L

  def compute(words: ArrayData, w: Int): ArrayData = {
    val m = words.numElements()
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    // Each token hashed ONCE (the declarative form re-hashed every
    // token w times as part of w different joined strings).
    val t = new Array[Long](m)
    var i = 0
    while (i < m) {
      t(i) = if (words.isNullAt(i)) 0L
             else XXH64.hashUTF8String(words.getUTF8String(i), 42L)
      i += 1
    }
    var bwm1 = 1L // B^(w-1), the coefficient of the outgoing token
    i = 1
    while (i < w) { bwm1 *= Base; i += 1 }
    val out = new Array[Long](m - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + t(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= m - w) {
      h = (h - t(i - 1) * bwm1) * Base + t(i + w - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def window_hashes(words: Column, w: Int): Column =
    GraftColumn.column(WindowHashes(GraftColumn.expression(words), w))
}
