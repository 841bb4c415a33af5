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

object HyperplaneFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def hyperplane_buckets(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    column(HyperplaneBuckets(expression(vec), planes))
}
