package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable EXACT running sums — the general form of q59's bucket
  * decomposition (round-2 verdict #2).
  *
  * A naive `sum(v) over (partition by p order by o)` puts each partition
  * through ONE sorted reducer — at 100 TB the biggest partition is a
  * single-task scale-killer. Decompose instead over a caller-supplied
  * bucket key that is a PREFIX of the ordering (so ordering by
  * (bucket, order) equals ordering by (order) — e.g. the leading hex
  * chars of a uniform hash key the caller already orders by):
  *
  *   1. per-(part, bucket) sums — an ordinary two-phase aggregate;
  *   2. a window over those METADATA rows (parts × #buckets, tiny)
  *      computes each bucket's starting offset;
  *   3. the real running sum runs per (part, bucket) shard —
  *      1/#buckets of a partition each, all shards in parallel —
  *      seeded with the broadcast offset.
  *
  * The result is bit-identical to the serial window (QueriesSpec asserts
  * it); only the parallelism changes. Raise the bucket-key granularity
  * with data volume (2 hex chars = 256 shards, 4 = 65 536).
  */
object PrefixSum {

  /** Adds `outCol` = exact running sum of `valCol` over
    * (partition `partCols`; order `orderCols`), sharded by `bucketCol`.
    * REQUIREMENT: `bucketCol` must be a monotone prefix of the ordering —
    * rows ordering before each other across different buckets must have
    * bucketCol values in the same order (true for any leading substring /
    * leading digits of the first order column). */
  def runningSum(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
      valCol: String, bucketCol: Column, outCol: String): DataFrame = {
    val b = "__ps_bucket"
    val withB = df.withColumn(b, bucketCol)
    val metaW = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB
      .groupBy((partCols :+ b).map(col): _*)
      .agg(sum(col(valCol)).as("__ps_sum"))
      .withColumn("__ps_offset", sum(col("__ps_sum")).over(metaW) - col("__ps_sum"))
      .select((partCols :+ b).map(col) :+ col("__ps_offset"): _*)
    val shardW = Window
      .partitionBy((partCols :+ b).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offsets), partCols :+ b)
      .withColumn(outCol, col("__ps_offset") + sum(col(valCol)).over(shardW))
      .drop(b, "__ps_offset")
  }
}
