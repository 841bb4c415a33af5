package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable EXACT global ranking — the range-partitioned two-pass that
  * replaces `row_number() OVER (ORDER BY …)`'s single sorted reducer
  * (round-7 verdict #2/#8: q168's three user-frame ranks and q185's Gini
  * rank were the suite's last unpartitioned windows over an unbounded
  * frame; this operator generalizes the q144/q59 PrefixSum discipline
  * into a reusable primitive).
  *
  * Mechanics:
  *   1. `repartitionByRange` on the full ordering key — Spark samples the
  *      key distribution and picks balanced boundaries, so no shard
  *      inherits a whole skewed partition; ordering ties land in the same
  *      shard by construction (RangePartitioner routes by key compare).
  *   2. A block-local `row_number` per shard — `spark_partition_id()` is
  *      the shard key, and because range partition i holds strictly
  *      smaller keys than partition i+1 (AQE does not reorder or split a
  *      user-specified range exchange with an explicit partition count),
  *      shard-id order IS key order.
  *   3. Each shard's row count is a metadata frame (≤ `shards` rows); a
  *      running sum over it (trivially small window) yields per-shard
  *      offsets, broadcast back and added to the local rank.
  *
  * The result is bit-identical to the serial window — ScaleSpec asserts
  * equality — but the big sort runs `shards`-wide in parallel and no
  * executor ever materializes more than ~1/shards of the frame.
  *
  * REQUIREMENT: `order` must be a TOTAL order (include a unique
  * tiebreaker column) — equal full keys would make block-local ranks
  * nondeterministic across retries.
  */
object GlobalRank {

  /** Adds `outCol` = row_number() over (ORDER BY `order`…), computed with
    * a `shards`-way range exchange instead of a single-partition sort. */
  def rowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      shards: Int = 0): DataFrame = {
    val n =
      if (shards > 0) shards
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val pid = "__gr_pid"
    val lrk = "__gr_lrk"
    val cnt = "__gr_cnt"
    val off = "__gr_off"
    val parted = df.repartitionByRange(n, order: _*)
      .withColumn(pid, spark_partition_id().cast("long"))
    // Window.partitionBy(pid) re-shuffles by pid hash, but each shard
    // moves as ONE block to one reducer — the per-shard sort is the same
    // work the serial window would have done on 1/n of the data.
    val local = parted.withColumn(lrk,
      row_number().over(Window.partitionBy(col(pid)).orderBy(order: _*)).cast("long"))
    val offsets = parted.groupBy(col(pid)).agg(count(lit(1)).as(cnt))
      .withColumn(off,
        sum(col(cnt)).over(Window.orderBy(col(pid))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col(cnt))
      .select(col(pid), col(off))
    local.join(broadcast(offsets), pid)
      .withColumn(outCol, col(off) + col(lrk))
      .drop(pid, lrk, off)
  }
}
