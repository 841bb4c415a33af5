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
    * (inclusive as-of, DuckDB `ON l.t >= r.t` semantics).
    *
    * All right value columns are carried as ONE struct with a single
    * last(ignoreNulls): the matched right row is atomic, so a right row
    * with a null in one value column still contributes that null (true
    * as-of semantics) instead of forward-filling each column from a
    * different row. */
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
      .withColumn("_rv", lit(null))
    val r = right
      .withColumn("_tag", lit(0))
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_key", col(keyCol))
      .withColumn("_rv", struct(rightValueCols.map(col): _*))
    val unioned = l
      .select((leftCols.map(col) ++ Seq(col("_tag"), col("_t"), col("_key"), col("_rv"))): _*)
      .unionByName(
        r.select(
          (leftCols.map(c => lit(null).as(c)) ++ Seq(col("_tag"), col("_t"), col("_key"), col("_rv"))): _*))
    val w = Window
      .partitionBy(col("_key"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = unioned.withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
    val renames: Seq[Column] =
      leftCols.map(col) ++ rightValueCols.map(c => col("_rv").getField(c).as(s"asof_$c"))
    withCarry.filter(col("_tag") === 1).select(renames: _*)
  }
}
