package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink operators (SURVEY.md §2.7 K1–K6).
  *
  * The reference lands Snappy Parquet on a 10-second micro-batch trigger
  * with a per-sink checkpoint (write_swords_stream.py:60–66,
  * README.md:415–421). At 100 TB the parquet layout is the performance
  * contract: output is partitioned by low-cardinality routing columns so
  * downstream scans partition-prune, and compression stays Snappy (cheap
  * CPU, splittable pages).
  */
object Sinks {

  val DefaultTrigger: Trigger = Trigger.ProcessingTime("10 seconds")

  /** K1: streaming parquet sink with checkpoint + trigger. `partitionBy`
    * columns become physical directories → static/dynamic partition pruning
    * for every downstream reader. */
  def streamingParquet(
      df: DataFrame,
      path: String,
      checkpoint: String,
      trigger: Trigger = DefaultTrigger,
      partitionBy: Seq[String] = Nil): StreamingQuery = {
    val w: DataStreamWriter[Row] = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .option("compression", "snappy")
      .trigger(trigger)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** K2: console sink (debug; filter_swords_stream.py:62–65). */
  def console(df: DataFrame, trigger: Trigger = DefaultTrigger): StreamingQuery =
    df.writeStream.format("console").trigger(trigger).start()

  /** K3: batch parquet overwrite (filtered_writes.py:46–49). */
  def batchParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "snappy")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** K5: external-table DDL over a parquet location (README.md:394–410),
    * re-expressed against Spark's built-in catalog — no Hive metastore
    * needed. Readers get schema-on-read decoupled from the writer. */
  def registerExternalTable(spark: SparkSession, table: String, location: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING PARQUET LOCATION '$location'")
  }

  /** K6 (fixed): the reference chains three blocking awaitTermination calls
    * so sinks 2–3 never start (SURVEY.md §0.2). Correct multi-sink wait. */
  def awaitAll(spark: SparkSession): Unit =
    spark.streams.awaitAnyTermination()
}
