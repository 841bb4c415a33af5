package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode: the vector is split into `m` contiguous
  * subspaces and each subspace is assigned its argmin-L2² codebook entry.
  *
  * `codebooks(s)(c)` is centroid `c` of subspace `s` (m × ksub × subdim
  * doubles — 8 KB at the 8×16×8 defaults), carried inside the expression
  * like [[NearestCells]]' centroid matrix, so encoding is MAP-ONLY: a 100 TB
  * embedding corpus compresses 32× (64 floats → 8 codes) without a single
  * Exchange. Output is one struct per subspace: the winning code and its
  * exact squared distance (the reconstruction error of that subspace).
  *
  * Distances accumulate as a left-to-right `(x−y)·(x−y)` fold in DOUBLE —
  * each step one correctly-rounded IEEE subtract and multiply, identical to
  * DuckDB's `list_reduce` fold over the same values — so dists, and
  * therefore argmins, are bit-portable (the [[CosineSimilarity]] /
  * VectorOracles pattern). Ties break toward the lower code index. Vectors
  * shorter than m·subdim cannot be encoded → null.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")
  private val m = codebooks.length
  private val subdim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("code", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    if (n < m * subdim) return null
    val local = new Array[Double](m * subdim)
    var i = 0
    while (i < m * subdim) {
      local(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val off = s * subdim
      var bestCode = -1
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var acc = 0.0
        var j = 0
        while (j < subdim) {
          val diff = local(off + j) - cen(j)
          acc += diff * diff
          j += 1
        }
        if (bestCode == -1 || acc < bestDist) { bestCode = c; bestDist = acc }
        c += 1
      }
      out(s) = InternalRow(bestCode, bestDist)
      s += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC (asymmetric-distance) lookup table for one query vector: the partial
  * squared distance from the query's subvector `s` to EVERY codebook entry —
  * m·ksub `(subspace, code, partial)` structs. Computed map-side on the
  * (small) query set; the corpus never touches vectors again: its
  * `(subspace, code)` int rows join this LUT and sum to the approximate
  * distance. Same bit-portable fold as [[PqEncode]]. */
case class PqAdcLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  private val m = codebooks.length
  private val subdim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("subspace", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("partial", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() < m * subdim) return null
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val off = s * subdim
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var acc = 0.0
        var j = 0
        while (j < subdim) {
          val x = if (isFloat) vec.getFloat(off + j).toDouble else vec.getDouble(off + j)
          val diff = x - cen(j)
          acc += diff * diff
          j += 1
        }
        rows += InternalRow(s, c, acc)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(rows.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC distance of one (query vector, code array) pair: Σ_s ‖q_s − c_s‖²
  * where c_s is codebook entry `codes(s).code` of subspace s — the
  * codes-only scoring step of an IVFPQ search, one expression per
  * candidate row so the corpus side of the search carries CODES, never
  * vectors. Both folds are fixed-order (j within s, then s ascending), so
  * the distance — and therefore the top-k ranking — is bit-portable to a
  * SQL oracle (`list_reduce(list(partial ORDER BY subspace), +)`).
  * `right` is [[PqEncode]]'s output (array of (code, dist) structs; the
  * dist field is ignored here). */
case class PqAdcDist(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  private val m = codebooks.length
  private val subdim = codebooks(0)(0).length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, enc: Any): Any = {
    val vec = q.asInstanceOf[ArrayData]
    val codes = enc.asInstanceOf[ArrayData]
    if (vec.numElements() < m * subdim || codes.numElements() < m) return null
    var total = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getStruct(s, 2).getInt(0)
      // Codes produced against a different (larger-ksub) codebook are not
      // scorable here — null, the same contract as a short vector, rather
      // than an executor ArrayIndexOutOfBounds.
      if (code < 0 || code >= codebooks(s).length) return null
      val cen = codebooks(s)(code)
      val off = s * subdim
      var acc = 0.0
      var j = 0
      while (j < subdim) {
        val x = if (isFloat) vec.getFloat(off + j).toDouble else vec.getDouble(off + j)
        val diff = x - cen(j)
        acc += diff * diff
        j += 1
      }
      total += acc
      s += 1
    }
    total
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(vec), codebooks))
  def pq_adc_lut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqAdcLut(expression(vec), codebooks))
  def pq_adc_dist(queryVec: Column, enc: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqAdcDist(expression(queryVec), expression(enc), codebooks))
}
