package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: bucketing for co-located joins, salting for skew.
  *
  * These are the knobs that matter at 100 TB and are invisible at test
  * scale: a bucketed fact⋈fact join runs with ZERO shuffle (both sides
  * pre-partitioned on the join key at write time), and a salted join keeps
  * one hot key from serializing an entire stage.
  */
object Scale {

  /** Write `df` as a bucketed+sorted table: `buckets` files per partition
    * clustered on `keys`. Two tables bucketed the same way join with no
    * exchange — the physical plan goes straight from scan to SortMergeJoin.
    * (Bucketing requires the catalog, hence saveAsTable.) */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("compression", "snappy")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables; with
    * spark.sql.sources.bucketing.enabled (default on) the plan contains no
    * Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Salted inner equi-join for skewed keys: the build side is exploded
    * `salt` ways, the probe side picks a random-but-deterministic salt per
    * row, so one hot key spreads across `salt` reducers. AQE's skew-join
    * handles most cases at runtime; explicit salting is for the pathological
    * key that exceeds even a split partition. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salt: Int = 8): DataFrame = {
    val saltedLeft = skewed.withColumn(
      "_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val explodedRight = other.withColumn(
      "_salt", explode(array((0 until salt).map(lit): _*)))
    saltedLeft
      .join(explodedRight, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Range-partition + sort within partitions: the write layout for
    * time-series output (clustered scans, partition pruning on the sort
    * key ranges). */
  def sortedWrite(df: DataFrame, path: String, byCol: String, partitions: Int): Unit =
    df.repartitionByRange(partitions, col(byCol))
      .sortWithinPartitions(col(byCol))
      .write.mode("overwrite").option("compression", "snappy").parquet(path)

  /** Hive-style directory partitioning: one directory per distinct value
    * combination of `cols`. A reader filtering on a partition column
    * prunes whole directories at PLANNING time (`PartitionFilters` on the
    * scan — zero data files opened for excluded partitions), which is the
    * difference between scanning 100 TB and scanning one day of it. Keep
    * `cols` low-cardinality (each combination is a directory + its file
    * overhead). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(cols: _*)
      .option("compression", "snappy")
      .parquet(path)
}
