package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused word-array → n-gram-shingle kernels.
  *
  * The declarative pipeline (`transform(sequence(...), i ->
  * xxhash64(w[i], w[i+1], w[i+2]))` + `array_distinct` + `sort_array`,
  * or string shingles feeding [[MinHashSig]]/[[SimHash64]]) evaluates
  * higher-order functions interpreted — measured as the dominant cost
  * of every dedup operator. These expressions do the same math in one
  * tight loop per row behind a static codegen call.
  *
  * Shingle hash = XXH64 chained across the n words (seed → h(w0) →
  * h(w1) → h(w2)), exactly the semantics of Spark's variadic
  * `xxhash64(w[i], w[i+1], w[i+2])`, so [[HashedShingles]] produces
  * bit-identical arrays to the declarative form it replaces.
  */
private[functions] object ShingleKernel {
  /** Chained-XXH64 hashes of all n-grams of `words` (with nulls
    * treated as skip — Spark's variadic xxhash64 skips null args).
    */
  def grams(words: ArrayData, n: Int): Array[Long] = {
    val m = words.numElements()
    if (m < n) return Array.emptyLongArray
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = 42L // Spark's xxhash64 seed
      var j = i
      while (j < i + n) {
        if (!words.isNullAt(j)) h = XXH64.hashUTF8String(words.getUTF8String(j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Sorted + deduplicated in place; returns the deduped length. */
  def sortDedup(a: Array[Long]): Int = {
    if (a.isEmpty) return 0
    java.util.Arrays.sort(a)
    var w = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    w
  }
}

/** Sorted distinct 64-bit hashes of the word n-grams — the shingle-set
  * representation [[IntersectCountSorted]] merge-scans. Equals
  * `sort_array(array_distinct(transform(sequence(0, size(w)-n), i ->
  * xxhash64(w[i], …, w[i+n-1]))))` bit for bit.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and n > 0, got ${t.simpleString}")
  }

  override def nullSafeEval(words: Any): Any =
    HashedShingles.compute(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {
  def compute(words: ArrayData, n: Int): ArrayData = {
    val g = ShingleKernel.grams(words, n)
    val len = ShingleKernel.sortDedup(g)
    new GenericArrayData(java.util.Arrays.copyOf(g, len))
  }

  def hashed_shingles(words: Column, n: Int = 3): Column =
    GraftColumn.column(HashedShingles(GraftColumn.expression(words), n))
}

/** MinHash signature straight from the word array: shingle hashes and
  * the k-wide Kirsch–Mitzenmacher minima in one pass, no intermediate
  * array, no dedup (duplicates cannot change a minimum). Same signature
  * math as [[MinHashSig]] with the shingle string-build removed.
  */
case class MinHashShingled(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingled"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 && k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, n > 0, k > 0, got ${t.simpleString}")
  }

  override def nullSafeEval(words: Any): Any =
    MinHashShingled.compute(words.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashShingled.compute($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashShingled {
  private val SEED1 = 0x9747b28cL
  private val SEED2 = 0x85ebca6bL

  def compute(words: ArrayData, n: Int, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val grams = ShingleKernel.grams(words, n)
    var t = 0
    while (t < grams.length) {
      val g = grams(t)
      val h1 = XXH64.hashLong(g, SEED1)
      val h2 = XXH64.hashLong(g, SEED2)
      var i = 0
      var h = h1
      while (i < k) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  def minhash_shingled(words: Column, n: Int = 3, k: Int = 64): Column =
    GraftColumn.column(MinHashShingled(GraftColumn.expression(words), n, k))
}

/** SimHash64 straight from the word array: hash shingles, dedup (set
  * semantics — each distinct shingle votes once, like [[SimHash64]]
  * over a distinct shingle array), accumulate bit votes. One pass.
  */
case class SimHashShingled(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_shingled"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and n > 0, got ${t.simpleString}")
  }

  override def nullSafeEval(words: Any): Any =
    SimHashShingled.compute(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashShingled.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashShingled {
  private val SEED = 0xc2b2ae35L

  def compute(words: ArrayData, n: Int): Long = {
    val grams = ShingleKernel.grams(words, n)
    val len = ShingleKernel.sortDedup(grams)
    val votes = new Array[Int](64)
    var t = 0
    while (t < len) {
      val h = XXH64.hashLong(grams(t), SEED)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def simhash_shingled(words: Column, n: Int = 3): Column =
    GraftColumn.column(SimHashShingled(GraftColumn.expression(words), n))
}
