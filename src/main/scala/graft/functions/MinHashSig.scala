package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._

/** MinHash signature of a token set, one pass, no shuffle.
  *
  * The classic Spark-shaped MinHash (explode tokens → k hash columns →
  * groupBy(doc).agg(min×k)) shuffles |tokens| rows per document; at
  * 100 TB that shuffle dwarfs the actual hashing. This expression
  * computes the k-wide signature per row inside the scan stage — zero
  * extra shuffle — and participates in whole-stage codegen via a static
  * call (same pattern as [[HmacSha256]]).
  *
  * Hash family: two independent XXH64 seeds per token, combined as
  * h_i = h1 + i·h2 (Kirsch–Mitzenmacher double hashing) — 2 hashes per
  * token instead of k, standard for Bloom/MinHash families.
  *
  * Null tokens inside the array are skipped; an empty/all-null token set
  * yields Long.MaxValue sentinels (an "empty document" signature that
  * never collides with real minima in LSH banding except with other
  * empty documents, which IS the correct dedup answer).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and k > 0, got ${child.dataType.simpleString}, k=$k")
  }

  override def nullSafeEval(tokens: Any): Any =
    MinHashSig.compute(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val SEED1 = 0x9747b28cL
  private val SEED2 = 0x85ebca6bL

  /** Static entry point shared by the interpreted and codegen paths. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s = tokens.getUTF8String(t)
        val h1 = XXH64.hashUTF8String(s, SEED1)
        val h2 = XXH64.hashUTF8String(s, SEED2)
        var i = 0
        var h = h1
        while (i < k) {
          if (h < sig(i)) sig(i) = h
          h += h2 // h = h1 + i*h2, rolling add instead of multiply
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  def minhash_sig(tokens: Column, k: Int): Column =
    GraftColumn.column(MinHashSig(GraftColumn.expression(tokens), k))
}
