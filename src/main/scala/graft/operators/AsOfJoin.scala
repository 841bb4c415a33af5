package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * right.time <= left.time, per key — the temporal join Spark has no
  * native operator for (pandas merge_asof / DuckDB ASOF JOIN).
  *
  * Composed rather than a custom SparkPlan (builder preference order (a)):
  * union the two sides tagged, ONE shuffle on (key), sort within
  * partitions by (time, tag), and carry the latest right value forward
  * with last_value(ignoreNulls) — O(n log n) per key group, no range
  * join explosion, watermark-friendly shape. A custom exec node would
  * save only the union projection; the shuffle/sort cost is identical.
  */
object AsOfJoin {

  /** Left rows get `rightValueCols` from the latest right row at or before
    * their time. Right rows at exactly equal time sort BEFORE left rows
    * (inclusive as-of, DuckDB `ON l.t >= r.t` semantics). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_tag", lit(1))
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_key", col(keyCol))
    val carried = rightValueCols.map(c => s"_r_$c")
    val r0 = right
      .withColumn("_tag", lit(0))
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_key", col(keyCol))
    val r = rightValueCols.zip(carried).foldLeft(r0) { case (df, (c, a)) =>
      df.withColumn(a, col(c))
    }
    val lNorm = carried.foldLeft(l)((df, a) => df.withColumn(a, lit(null)))
    val unioned = lNorm
      .select((leftCols.map(col) ++ Seq(col("_tag"), col("_t"), col("_key")) ++ carried.map(col)): _*)
      .unionByName(
        r.select(
          (leftCols.map(c => lit(null).as(c)) ++ Seq(col("_tag"), col("_t"), col("_key")) ++ carried.map(col)): _*))
    val w = Window
      .partitionBy(col("_key"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = carried.foldLeft(unioned) { (df, a) =>
      df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    val renames: Seq[Column] =
      leftCols.map(col) ++ rightValueCols.zip(carried).map { case (c, a) => col(a).as(s"asof_$c") }
    withCarry.filter(col("_tag") === 1).select(renames: _*)
  }
}
