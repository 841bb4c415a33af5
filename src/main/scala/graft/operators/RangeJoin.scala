package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows matched to right rows whose
  * [lo, hi) interval contains the left value — the second temporal/numeric
  * join Spark has no native operator for (DuckDB range join / IEJoin).
  *
  * Spark's own plan for a pure range predicate is a broadcast nested loop —
  * O(|L|·|R|) comparisons, a scale-killer the moment neither side
  * broadcasts. This operator BINS both sides by a fixed width instead:
  * values land in one bin, intervals explode to the ⌈span/width⌉+1 bins
  * they overlap, the join is a plain equi-join on the compact bin long,
  * and the exact predicate re-checks candidates. One shuffle on bin keys;
  * work proportional to true-candidate volume. Pick `binWidth` near the
  * typical interval span: each interval then explodes to ~2 bins, and a
  * bin holds only values within one span of its intervals.
  */
object RangeJoin {

  /** Inner range join: rows of `left` × rows of `right` with
    * left.`value` ∈ [right.`lo`, right.`hi`). `lo`/`hi` are expressions
    * over `right`'s columns; `value` over `left`'s. Output carries all
    * columns of both sides (names must not collide — standard join
    * hygiene). */
  def inner(left: DataFrame, right: DataFrame,
      value: Column, lo: Column, hi: Column, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("_rj_bin", floor(value / binWidth).cast("long"))
    val rb = right
      .withColumn("_rj_lo", lo)
      .withColumn("_rj_hi", hi)
      .withColumn(
        "_rj_bin",
        explode(sequence(
          floor(col("_rj_lo") / binWidth).cast("long"),
          floor(col("_rj_hi") / binWidth).cast("long"))))
    lb.join(rb, Seq("_rj_bin"))
      .filter(value >= col("_rj_lo") && value < col("_rj_hi"))
      .drop("_rj_bin", "_rj_lo", "_rj_hi")
  }
}
