package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`p` nearest IVF cells for an embedding: the indices of the `p`
  * coarse-quantizer centroids with the largest dot product against the
  * input vector, descending (ties broken toward the lower cell id).
  *
  * The centroid matrix rides INSIDE the expression (flattened
  * row-major, L2-normalized at construction by [[graft.operators.Ivf]])
  * rather than through a join: the quantizer is small by design
  * (nlist ≈ √n vectors — ~900 × 64 floats at n = 800k), so it ships to
  * executors as one codegen reference object and cell assignment stays
  * a map-side, shuffle-free pass. Because the centroids are unit
  * vectors, argmax-dot equals argmax-cosine — the norm of the INPUT is
  * a common positive factor across cells and never needs computing.
  *
  * One codegen'd kernel (same interpreted/codegen static-entry pattern
  * as [[LshBuckets]]): data-side assignment calls it with p = 1, the
  * query side with p = nprobe. Cost is nlist·dim fused multiply-adds
  * per row plus an insertion into a p-slot top list (p ≪ nlist).
  */
case class IvfCells(child: Expression, centroids: Array[Float], dim: Int, p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if dim > 0 && centroids.length % dim == 0 && centroids.length >= dim &&
          p > 0 && p <= centroids.length / dim =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, centroids a non-empty multiple of dim, " +
        s"0 < p <= nlist; got ${t.simpleString}, |centroids|=${centroids.length}, dim=$dim, p=$p")
  }

  override def nullSafeEval(emb: Any): Any =
    IvfCells.topCells(emb.asInstanceOf[ArrayData], centroids, dim, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfCells.topCells($c, $cents, $dim, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array[Float] equality is reference equality under case-class
  // semantics, which breaks plan canonicalization (two IvfCells over
  // identical trained centroids would never compare equal after a
  // copy). Compare contents.
  override def equals(other: Any): Boolean = other match {
    case o: IvfCells =>
      o.child == child && o.dim == dim && o.p == p &&
        java.util.Arrays.equals(o.centroids, centroids)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim), Integer.valueOf(p),
      Integer.valueOf(java.util.Arrays.hashCode(centroids)))
}

object IvfCells {

  /** Static entry point shared by the interpreted and codegen paths.
    * Maintains a descending p-slot insertion list of (dot, cell); ties
    * prefer the lower cell id (strict `>` on insert keeps the earlier
    * cell ahead of an equal later one).
    */
  def topCells(emb: ArrayData, centroids: Array[Float], dim: Int, p: Int): ArrayData = {
    val nlist = centroids.length / dim
    val d = math.min(dim, emb.numElements())
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = emb.getFloat(i).toDouble; i += 1 }
    val topDot = new Array[Double](p)
    val topCell = new Array[Int](p)
    java.util.Arrays.fill(topDot, Double.NegativeInfinity)
    var c = 0
    while (c < nlist) {
      var acc = 0.0
      val off = c * dim
      i = 0
      while (i < d) { acc += x(i) * centroids(off + i); i += 1 }
      if (acc > topDot(p - 1)) {
        // insertion sort into the top-p slots, descending
        var j = p - 1
        while (j > 0 && topDot(j - 1) < acc) {
          topDot(j) = topDot(j - 1); topCell(j) = topCell(j - 1); j -= 1
        }
        topDot(j) = acc; topCell(j) = c
      }
      c += 1
    }
    new GenericArrayData(topCell)
  }

  def ivf_cells(emb: Column, centroids: Array[Float], dim: Int, p: Int): Column =
    GraftColumn.column(IvfCells(GraftColumn.expression(emb), centroids, dim, p))
}
