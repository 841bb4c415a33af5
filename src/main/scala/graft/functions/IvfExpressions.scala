package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The k cells nearest a vector by cosine, against a FIXED centroid matrix
  * carried in the expression (ties break toward the lower cell index).
  *
  * This is the map-only IVF routing primitive: the previous formulation —
  * broadcast-cross-join ×nlist then a per-id row_number window — shuffled
  * the whole corpus nlist× and again for the window, twice per index build.
  * Scoring all centroids inside one expression keeps assignment inside the
  * scan stage: zero Exchanges until the actual cell join.
  *
  * The matrix ships with the serialized expression (task closure). At
  * nlist=1024, dim=1024 doubles that is 8 MB — the same order as a broadcast
  * variable; far beyond that, IVF routing stops being a scalar function and
  * wants a proper coarse-quantizer join anyway.
  *
  * Cosine accumulation matches [[CosineSimilarity]] exactly (left-to-right
  * dot/norms, single division) so scores agree bit-for-bit with the verify
  * stage. Zero-norm vectors (null cosine) rank below every real score.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && k <= centroids.length, s"k=$k out of range for ${centroids.length} centroids")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val local = new Array[Double](n)
    var i = 0
    var nv = 0.0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      local(i) = x
      nv += x * x
      i += 1
    }
    val nlist = centroids.length
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cen = centroids(c)
      val d = math.min(n, cen.length)
      var dot = 0.0
      var nc = 0.0
      var j = 0
      while (j < d) { dot += local(j) * cen(j); nc += cen(j) * cen(j); j += 1 }
      sims(c) = if (nv == 0.0 || nc == 0.0) Double.NegativeInfinity
      else dot / math.sqrt(nv * nc)
      c += 1
    }
    // Selection of the k best (sim desc, cell asc): k and nlist are both
    // small (k ≤ nprobe ≤ nlist ≤ ~2^10), so k linear sweeps beat a heap.
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var s = 0
    while (s < k) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var t = 0
      while (t < nlist) {
        if (!taken(t) && (best == -1 || sims(t) > bestSim)) { best = t; bestSim = sims(t) }
        t += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object IvfFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def nearest_cells(vec: Column, centroids: Array[Array[Double]], k: Int): Column =
    column(NearestCells(expression(vec), centroids, k))
}
