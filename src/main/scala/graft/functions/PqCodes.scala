package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels for the IVF-PQ tier (SURVEY §2.4; the
  * standard two-stage FAISS serve): a vector is split into `m`
  * subspaces of `dsub` dims, each subvector quantized to the nearest of
  * 256 per-subspace centroids, so the stored code is m bytes instead of
  * dim·4 — at dim=64, m=8 that is 8 B/vector against 256 B, a 32×
  * candidate-I/O compression for the probed-cell scan. Scoring is ADC
  * (asymmetric distance computation): the QUERY stays exact, its dot
  * against every possible centroid is precomputed into an m·256-entry
  * lookup table, and a candidate's approximate dot is m table lookups —
  * no float math per candidate at all.
  *
  * All three kernels follow the [[IvfCells]] conventions: flattened
  * row-major reference-object codebooks (m·256·dsub floats ≈ 64 KB at
  * the defaults — bounded driver/executor state in the centroid-matrix
  * class), static interpreted/codegen entry points, argmin ties broken
  * toward the lower code, content-based equals/hashCode so plan
  * canonicalization survives the array payloads.
  */
object PqCodes {

  /** Codebook layout: cb[((j·256 + c)·dsub) + i] = coordinate i of
    * centroid c of subspace j.
    */
  def encode(emb: ArrayData, cb: Array[Float], m: Int, dsub: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    val n = emb.numElements()
    var j = 0
    while (j < m) {
      var bestC = 0
      var bestD = Double.MaxValue
      val subBase = j * dsub
      var c = 0
      while (c < 256) {
        val off = (j * 256 + c) * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          // missing trailing coords read as 0 (the IvfCells convention)
          val x = if (subBase + i < n) emb.getFloat(subBase + i).toDouble else 0.0
          val diff = x - cb(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c } // strict < keeps the lower code on ties
        c += 1
      }
      out(j) = bestC.toByte
      j += 1
    }
    out
  }

  /** Nearest code of ONE subspace — the training-assignment kernel
    * (the Lloyd loop explodes the sample per subspace and groups on
    * (subspace, code), so assignment must be per-subvector).
    */
  def nearest(j: Int, sv: ArrayData, cb: Array[Float], dsub: Int): Int = {
    val n = sv.numElements()
    var bestC = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < 256) {
      val off = (j * 256 + c) * dsub
      var d = 0.0
      var i = 0
      while (i < dsub) {
        val x = if (i < n) sv.getFloat(i).toDouble else 0.0
        val diff = x - cb(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; bestC = c }
      c += 1
    }
    bestC
  }

  /** ADC: Σ_j lut[j·256 + code[j]] — the approximate dot product of the
    * query against the candidate's reconstruction.
    */
  def adc(lut: ArrayData, code: Array[Byte]): Double = {
    var s = 0.0
    var j = 0
    while (j < code.length) {
      s += lut.getFloat(j * 256 + (code(j) & 0xff))
      j += 1
    }
    s
  }

  def pq_encode(emb: Column, cb: Array[Float], m: Int, dsub: Int): Column =
    GraftColumn.column(PqEncode(GraftColumn.expression(emb), cb, m, dsub))

  def pq_nearest(j: Column, sv: Column, cb: Array[Float], dsub: Int): Column =
    GraftColumn.column(
      PqNearest(GraftColumn.expression(j), GraftColumn.expression(sv), cb, dsub))

  def pq_adc(lut: Column, code: Column): Column =
    GraftColumn.column(PqAdc(GraftColumn.expression(lut), GraftColumn.expression(code)))
}

/** m-byte PQ code of an embedding (storage-side encode pass — one
  * shuffle-free map over the corpus at index-build time).
  */
case class PqEncode(child: Expression, codebooks: Array[Float], m: Int, dsub: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if m > 0 && dsub > 0 && codebooks.length == m * 256 * dsub =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and |codebooks| = m*256*dsub; " +
        s"got ${t.simpleString}, |cb|=${codebooks.length}, m=$m, dsub=$dsub")
  }

  override def nullSafeEval(emb: Any): Any =
    PqCodes.encode(emb.asInstanceOf[ArrayData], codebooks, m, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqCodes.encode($c, $cb, $m, $dsub)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case o: PqEncode =>
      o.child == child && o.m == m && o.dsub == dsub &&
        java.util.Arrays.equals(o.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(dsub),
      Integer.valueOf(java.util.Arrays.hashCode(codebooks)))
}

/** Nearest-centroid code for one subspace's subvector (training
  * assignment; `left` = subspace index, `right` = the subvector).
  */
case class PqNearest(left: Expression, right: Expression,
                     codebooks: Array[Float], dsub: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_nearest"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(FloatType, _))
        if dsub > 0 && codebooks.length % (256 * dsub) == 0 && codebooks.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, array<float>) and |codebooks| a multiple of " +
        s"256*dsub; got (${l.simpleString}, ${r.simpleString}), " +
        s"|cb|=${codebooks.length}, dsub=$dsub")
  }

  override def nullSafeEval(j: Any, sv: Any): Any =
    PqCodes.nearest(j.asInstanceOf[Int], sv.asInstanceOf[ArrayData], codebooks, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, (j, sv) =>
      s"graft.functions.PqCodes.nearest($j, $sv, $cb, $dsub)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def equals(other: Any): Boolean = other match {
    case o: PqNearest =>
      o.left == left && o.right == right && o.dsub == dsub &&
        java.util.Arrays.equals(o.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Integer.valueOf(dsub),
      Integer.valueOf(java.util.Arrays.hashCode(codebooks)))
}

/** ADC lookup-sum: `left` = the query's m·256-float LUT column (one
  * array per query row, broadcast-joined onto candidates), `right` =
  * the candidate's m-byte code. No reference object — both inputs are
  * columns, so one compiled kernel serves every query.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float> lut, binary code); " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(lut: Any, code: Any): Any =
    PqCodes.adc(lut.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lut, code) =>
      s"graft.functions.PqCodes.adc($lut, $code)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
