package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket keys for all tables in one pass.
  *
  * The composable version evaluates tables×bits separate DotProduct
  * expressions, each re-walking the vector and its own typedLit plane
  * array. This expression holds the plane matrix as a primitive
  * [tables][bits][dim] array and produces every bucket key in a single
  * sweep: vector elements are read once per plane from ArrayData with no
  * per-expression overhead. */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val local = new Array[Double](n)
    var i = 0
    while (i < n) {
      local(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val keys = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var key = 0L
      var b = 0
      while (b < table.length) {
        val plane = table(b)
        val d = math.min(n, plane.length)
        var dot = 0.0
        var j = 0
        while (j < d) { dot += local(j) * plane(j); j += 1 }
        if (dot > 0) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-probe variant of [[HyperplaneBuckets]] (Lv et al. 2007,
  * "Multi-Probe LSH"): per table, emit the sign-bit bucket AND the bucket
  * with the LOWEST-MARGIN bit flipped — the |dot| closest to the plane is
  * the bit most likely to be on the wrong side for a true neighbor, so
  * probing its flip buys most of a second hash table's recall for zero
  * extra signatures. Ties on |dot| keep the lowest bit index (the strict-<
  * scan mirrors the oracle's ORDER BY ABS(dot), b). Output:
  * array<array<long>> — per table [key, key ^ (1<<argmin|dot|)]. */
case class HyperplaneProbes(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val local = new Array[Double](n)
    var i = 0
    while (i < n) {
      local(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[AnyRef](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var key = 0L
      var bestA = Double.MaxValue
      var bestB = 0
      var b = 0
      while (b < table.length) {
        val plane = table(b)
        val d = math.min(n, plane.length)
        var dot = 0.0
        var j = 0
        while (j < d) { dot += local(j) * plane(j); j += 1 }
        if (dot > 0) key |= (1L << b)
        val a = math.abs(dot)
        if (a < bestA) { bestA = a; bestB = b }
        b += 1
      }
      out(t) = new GenericArrayData(Array(key, key ^ (1L << bestB)))
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def hyperplane_buckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    column(HyperplaneBuckets(expression(vec), planes))
  def hyperplane_probes(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    column(HyperplaneProbes(expression(vec), planes))
}
