package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding math (SURVEY.md §7.3; builder
  * preference order (b): a native Expression beats a Scala UDF).
  *
  * Spark's built-in route for a dot product is
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)`, which materializes an
  * intermediate array per row and evaluates a lambda per element. These
  * expressions run a primitive while-loop straight over the columnar
  * ArrayData — no allocation, no boxing — which is the difference between
  * feasible and not at 10⁶×10³ candidate pairs per executor.
  */
private[graft] trait FloatArrayOps {
  /** Element accessor tolerant of float or double array inputs. */
  protected def elem(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalArgumentException(s"numeric array expected, got $et")
  }
  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
}

/** cosine(a, b) ∈ [-1, 1]; null if either vector has zero norm.
  *
  * Implements doGenCode (not CodegenFallback): the generated primitive loop
  * participates in whole-stage codegen, so candidate scoring stays in one
  * compiled stage with the surrounding join/filter instead of breaking the
  * pipeline at every row. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayOps {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elementType(left), elementType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elem(a, lt, i); val y = elem(b, rt, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) null else dot / math.sqrt(na * nb)
  }
  private def getter(e: Expression, arr: String, i: String): String =
    elementType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case other => throw new IllegalArgumentException(s"numeric array expected, got $other")
    }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(left, a, i)};
         |  double $y = ${getter(right, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) — raw inner product (used for LSH hyperplane signs, where the
  * norm is irrelevant). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with FloatArrayOps {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elementType(left), elementType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += elem(a, lt, i) * elem(b, rt, i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a numeric array. */
case class L2Norm(child: Expression)
    extends UnaryExpression with CodegenFallback with FloatArrayOps {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val et = elementType(child)
    var s = 0.0; var i = 0
    while (i < a.numElements()) { val x = elem(a, et, i); s += x * x; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash over an array of 64-bit token hashes: per bit position, sum +1/-1
  * votes across tokens; the sign of each sum becomes the output bit. A
  * single pass over the token hashes — the built-in-functions version needs
  * 64 nested aggregates per row. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Intersection cardinality of two SORTED arrays via a single merge scan —
  * O(n+m), no hash-set build, no output array. The workhorse of exact
  * Jaccard verification over LSH candidates, where built-in
  * array_intersect's per-row OpenHashSet dominates the profile. Elements
  * must be sorted ascending (sort once per row upstream, intersect
  * millions of times downstream). Supports string and integral arrays. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var n = 0
    elemType match {
      case StringType =>
        while (i < na && j < nb) {
          val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
          if (c == 0) { n += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
      case LongType =>
        while (i < na && j < nb) {
          val x = a.getLong(i); val y = b.getLong(j)
          if (x == y) { n += 1; i += 1; j += 1 }
          else if (x < y) i += 1
          else j += 1
        }
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
    n
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, j, cnt, na, nb) = (ctx.freshName("i"), ctx.freshName("j"),
        ctx.freshName("cnt"), ctx.freshName("na"), ctx.freshName("nb"))
      val body = elemType match {
        case StringType =>
          val c = ctx.freshName("c")
          s"""int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
             |if ($c == 0) { $cnt++; $i++; $j++; }
             |else if ($c < 0) $i++; else $j++;""".stripMargin
        case LongType =>
          val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
          s"""long $x = $a.getLong($i); long $y = $b.getLong($j);
             |if ($x == $y) { $cnt++; $i++; $j++; }
             |else if ($x < $y) $i++; else $j++;""".stripMargin
        case other => throw new IllegalArgumentException(s"unsupported element type $other")
      }
      s"""
         |int $i = 0, $j = 0, $cnt = 0;
         |int $na = $a.numElements(), $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  $body
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface for the expressions above. */
object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def cosine_sim(a: Column, b: Column): Column = column(CosineSimilarity(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def l2_norm(a: Column): Column = column(L2Norm(expression(a)))
  def simhash64(tokenHashes: Column): Column = column(SimHash64(expression(tokenHashes)))
  def sorted_intersect_size(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))
}
