package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event sources (SURVEY.md §2.1 S1–S3).
  *
  * The reference reads topic `events` from Kafka both as a stream
  * (filter_swords_stream.py:47–52) and as a bounded batch
  * (filter_swords_batch.py:47–54). Both shapes are one option-set here;
  * the harness substitutes parquet/memory sources with the same
  * (value, timestamp) contract, so the downstream ETL plan is identical
  * regardless of source.
  */
object EventSources {

  /** S1: Kafka streaming source. Kafka delivers (key, value, topic,
    * partition, offset, timestamp, timestampType); the ETL touches only
    * value + timestamp (SURVEY.md §1.1).
    *
    * `provider` is an injection seam: production leaves the default
    * ("kafka" → spark-sql-kafka connector); KafkaContractSpec substitutes
    * an envelope-shaped stand-in so the SAME builder path is driven all
    * the way through DataSource-V2 resolution to an analyzed streaming
    * plan in a sandbox with no kafka jar. */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest", provider: String = "kafka"): DataFrame =
    spark.readStream
      .format(provider)
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** S2: Kafka bounded batch source (earliest→latest). Same `provider`
    * seam as [[kafkaStream]]. */
  def kafkaBatch(spark: SparkSession, bootstrap: String, topic: String,
      provider: String = "kafka"): DataFrame =
    spark.read
      .format(provider)
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** Kafka-frame-shaped batch from in-memory rows: (value bytes, ingest
    * timestamp) — the deterministic stand-in for S3's Flask+ab producer in
    * tests and the harness. */
  def memoryBatch(spark: SparkSession, rows: Seq[(String, java.sql.Timestamp)]): DataFrame = {
    import spark.implicits._
    rows
      .toDF("value_str", "timestamp")
      .selectExpr("cast(value_str as binary) as value", "timestamp")
  }
}
